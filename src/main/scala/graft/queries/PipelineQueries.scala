package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.{PipelineOps, TextOps}

/** Dataset-assembly queries: deterministic splits and token-budget shard
  * packing over the `documents` fixture, each with a DuckDB oracle (both
  * ops are engine-portable by construction — md5 prefix ranges and prefix
  * sums).
  */
object PipelineQueries {

  /** Clamp shuffle partitions for a streaming replay's micro-batch jobs
    * (the e09 lesson; results are partition-count-independent). */
  private def withStatePartitions[T](s: SparkSession, n: Int)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = s.conf.get(key)
    s.conf.set(key, n.toString)
    try body finally s.conf.set(key, prev)
  }

  /** The multi-op out-of-order CDC change log p26/p29 share: amend →
    * delete → re-amend per %10==5 key, amend → delete per %10==7 key,
    * two versions of one fresh insert, a delete of a key that never
    * existed. (doc_id, source, text, op, seq). */
  private def cdcChangeLog(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, d)
    def slice(m: Int) = docs.filter(pmod(col("doc_id"), lit(10)) === m)
    slice(5).select(col("doc_id"), col("source"),
        concat(col("text"), lit(" amended a")).as("text"),
        lit("U").as("op"), lit(1L).as("seq"))
      .unionByName(slice(5).select(col("doc_id"), col("source"),
        col("text"), lit("D").as("op"), lit(2L).as("seq")))
      .unionByName(slice(5).select(col("doc_id"), col("source"),
        concat(col("text"), lit(" amended b")).as("text"),
        lit("U").as("op"), lit(3L).as("seq")))
      .unionByName(slice(7).select(col("doc_id"), col("source"),
        concat(col("text"), lit(" amended")).as("text"),
        lit("U").as("op"), lit(1L).as("seq")))
      .unionByName(slice(7).select(col("doc_id"), col("source"),
        col("text"), lit("D").as("op"), lit(2L).as("seq")))
      .unionByName(Seq(
        (-1L, "cdc", "fresh v one", "U", 1L),
        (-1L, "cdc", "fresh v two", "U", 2L),
        (-2L, "cdc", "never was", "D", 1L))
        .toDF("doc_id", "source", "text", "op", "seq"))
  }

  /** Build the 3-commit versioned table p28/p30/p31 exercise under a
    * fresh temp root: v1 = the documents snapshot, v2 amends %10==5 +
    * inserts 3 docs, v3 amends %10==3 + inserts 1 more. Returns the
    * table path (caller deletes the root after localCheckpointing its
    * result — the f72 artifact discipline). */
  private def threeVersionTable(s: SparkSession, d: String,
                                root: String): String = {
    import s.implicits._
    import graft.sources.VersionedTable
    val tbl = s"$root/tbl"
    val docs = Tables.documents(s, d)
    VersionedTable.commitCreate(
      docs.select("doc_id", "source", "text"), tbl, "doc_id", buckets = 8)
    def amend(m: Int) = docs.filter(pmod(col("doc_id"), lit(10)) === m)
      .select(col("doc_id"), col("source"),
        concat(col("text"), lit(s" amended$m")).as("text"))
    VersionedTable.commitUpsert(s, tbl, amend(5).unionByName(Seq(
        (-1L, "recrawl", "fresh doc one"),
        (-2L, "recrawl", "fresh doc two"),
        (-3L, "recrawl", "fresh doc three"))
        .toDF("doc_id", "source", "text")), "doc_id")
    VersionedTable.commitUpsert(s, tbl, amend(3).unionByName(Seq(
        (-4L, "recrawl", "fresh doc four"))
        .toDF("doc_id", "source", "text")), "doc_id")
    tbl
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Deterministic 80/10/10 split by md5(doc_id) hex prefix: per-row, no
    // shuffle, stable under corpus growth and engine migration.
    "p01_hash_split" -> ((s, d) =>
      PipelineOps.hashSplit(Tables.documents(s, d), "doc_id",
          Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)))
        .select("doc_id", "split")
        .orderBy("doc_id")),

    // Token-budget shard packing: shard = floor(exclusive-prefix-sum /
    // 2000) in doc_id order, prefix sum computed by the two-pass
    // distributed form (no single-task global window).
    "p02_pack_shards" -> ((s, d) =>
      PipelineOps.packShards(
          Tables.documents(s, d)
            .select(col("doc_id"),
              TextOps.tokenCount(col("text")).as("n_tokens")),
          "doc_id", "n_tokens", budget = 2000L)
        .select("doc_id", "n_tokens", "shard")
        .orderBy("doc_id")),

    // Greedy atomic-doc sequence packing (padding-free example packing):
    // 8 independent md5-sharded pack streams, docs fill a 512-token
    // sequence in doc_id order, overflow opens the next sequence. The
    // oracle replays each shard's greedy fold as a recursive CTE.
    "p11_pack_sequences" -> ((s, d) =>
      PipelineOps.packSequences(Tables.documents(s, d), "doc_id",
          TextOps.tokenCount(col("text")), budget = 512L, shards = 8)
        .orderBy("doc_id")),

    // Split-leakage audit: the p01 md5 split composed with d09's
    // contamination core — how many val/test docs are ≥80% shingle-
    // contained in SOME train doc (the leak every decontamination pass
    // exists to stop; the fixture's planted near-dups leak across the
    // hash split by construction, so the rates are non-trivial).
    // MERGEABLE datasheet: two half-corpus counter reports merged with
    // one keyed sum must equal the full-data report — additivity proven
    // against the all-documents oracle (the d27 KMV discipline for
    // corpus reporting; shard datasheets roll up without re-reads).
    "p15_report_merge" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val a = PipelineOps.corpusReport(
        docs.filter(pmod(col("doc_id"), lit(2)) === 0))
      val b = PipelineOps.corpusReport(
        docs.filter(pmod(col("doc_id"), lit(2)) =!= 0))
      PipelineOps.reportSummary(PipelineOps.mergeReports(a, b))
        .orderBy("source")
    }),

    // Content-addressed shard manifest: p02's shard assignment closed by
    // an order-free mod-2³¹ checksum of per-doc md5 hashes — the
    // integrity artifact a consumer diffs to catch drops/dupes/corruption
    // without re-reading doc contents in any particular order.
    "p14_shard_manifest" -> ((s, d) =>
      PipelineOps.shardManifest(
          Tables.documents(s, d).select(col("doc_id"),
            TextOps.tokenCount(col("text")).as("n_tokens"), col("text")),
          "doc_id", "n_tokens", "text", budget = 2000L)
        .orderBy("shard")),

    // Per-source deterministic reservoir (k=5): the balanced spot-check
    // sampler; WindowGroupLimit keeps k rows per group at the partial
    // stage, uniform-within-group by salted md5 rank.
    "p19_group_reservoir" -> ((s, d) =>
      PipelineOps.groupReservoir(Tables.documents(s, d), "source",
          "doc_id", k = 5)
        .orderBy("source", "pick")),

    // Per-epoch deterministic global shuffle: salted-md5 rank per epoch
    // through the bucketed distributed ranking — reproducible loader
    // order, independent across epochs, no single-task sort.
    "p18_epoch_shuffle" -> ((s, d) =>
      PipelineOps.epochShuffle(Tables.documents(s, d), "doc_id",
          epochs = 2)
        .orderBy("epoch", "pos")),

    // p13's audit made CONSTRUCTIVE: train docs with ≥0.8 3-gram
    // containment against any eval doc move to a quarantine bucket;
    // output is the per-doc split manifest a train job consumes.
    "p17_decontam_split" -> ((s, d) =>
      PipelineOps.decontaminatedSplit(Tables.documents(s, d), "doc_id",
          "text", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
          trainName = "train", n = 3, tau = 0.8)
        .orderBy("doc_id")),

    "p13_split_leakage" -> ((s, d) => {
      val split = PipelineOps.hashSplit(Tables.documents(s, d), "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      val train = split.filter(col("split") === "train")
      val eval_ = split.filter(col("split") =!= "train")
      val leaked = graft.ops.DedupOps
        .ngramContamination(train, eval_, "doc_id", "text", n = 3)
        .filter(col("containment") >= 0.8)
        .select(col("bench_id")).distinct()
        .withColumn("__leak", lit(1L))
      eval_.select(col("doc_id").as("bench_id"), col("split"))
        .join(leaked, Seq("bench_id"), "left")
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"),
          sum(coalesce(col("__leak"), lit(0L))).as("n_leaked"))
        .withColumn("leak_rate6", TextOps.round6(
          col("n_leaked").cast("double") / col("n_docs").cast("double")))
        .orderBy("split")
    }),

    // Token-budget mixture: per-source keep rates derived from TOKEN
    // totals (rate = min(1, budget*share / avail)), applied as the p04
    // md5 threshold; src1's share saturates (rate 1), src0 samples
    // thinly. Shares are absolute budget fractions — no weight
    // renormalization, so no cross-engine float summation anywhere.
    "p12_token_mixture" -> ((s, d) =>
      PipelineOps.tokenBudgetMixture(Tables.documents(s, d), "doc_id",
          "source", TextOps.tokenCount(col("text")),
          Map("src0" -> 0.01, "src1" -> 0.1), defaultShare = 0.05,
          budget = 20000L)
        .orderBy("source")),

    // Deterministic stratified sample: 5 docs per source by md5 draw.
    "p03_stratified_sample" -> ((s, d) =>
      PipelineOps.stratifiedTopK(Tables.documents(s, d), "doc_id",
          "source", k = 5)
        .select("doc_id", "source")
        .orderBy("doc_id")),

    // Temperature-balanced mixture at α = 0.5 over a skewed head/tail
    // family split: targets ∝ √n (upsample tails, downsample the head),
    // rates derived FROM the corpus — tails clamp to keep-all, the head
    // keeps a fractional md5 draw. √ is IEEE-exact, so even the derived
    // thresholds hash-match.
    "p16_temperature_mix" -> ((s, d) => {
      val docs = Tables.documents(s, d).withColumn("family",
        when(pmod(col("doc_id"), lit(7)) === 0, col("source"))
          .otherwise(lit("common")))
      PipelineOps.temperatureMixture(docs, "doc_id", "family",
          budget = 300L)
        .select("doc_id", "family", "share6", "target")
        .orderBy("doc_id")
    }),

    // Domain-mixture reweighting: per-source keep rates (100%/75%/50%/25%,
    // 10% default), decided per-row by a salted md5 draw.
    "p04_source_mixture" -> ((s, d) =>
      PipelineOps.mixtureSample(Tables.documents(s, d), "doc_id", "source",
          Map("src0" -> 1.0, "src1" -> 0.75, "src2" -> 0.5, "src3" -> 0.25),
          defaultRate = 0.1)
        .select("doc_id", "source")
        .orderBy("doc_id")),

    // Corpus report card: the per-source rollup a dataset release ships
    // with — doc counts, token volume, mean quality, language spread. ONE
    // partial+final aggregate keyed by source; the per-doc metrics are
    // pure expressions inside the partial side, so no second scan.
    "p05_corpus_report" -> ((s, d) =>
      Tables.documents(s, d).groupBy("source").agg(
          count(lit(1)).as("n_docs"),
          sum(TextOps.tokenCount(col("text"))).as("n_tokens"),
          TextOps.round6(avg(TextOps.qualityScore(col("text")))
            + lit(0.123456789)).as("mean_quality"),
          countDistinct(col("lang")).as("n_langs"))
        .orderBy("source")),

    // CORPUS-BUILD CAPSTONE — the full training-data assembly line in one
    // lazy plan: quality gate → near-dup survivor (jaccard losers
    // left_anti) → deterministic 80/10/10 split (train kept) → 2000-token
    // shard packing (two-pass distributed prefix sum) → per-shard report.
    // Every stage is individually gated (t02 / d03+d07 / p01 / p02); this
    // gate proves they COMPOSE — one pipeline, keyed joins and bounded
    // driver state only, nothing materialized between stages.
    "p06_corpus_build" -> ((s, d) => {
      import graft.ops.DedupOps
      val docs = Tables.documents(s, d)
      val losers = DedupOps.jaccardPairs(docs, "doc_id", "text", 3, 0.5)
        .select(col("id2").as("doc_id")).distinct()
      val survivors = docs
        .filter(TextOps.qualityScore(col("text")) >= 0.35)
        .join(losers, Seq("doc_id"), "left_anti")
      val train = PipelineOps.hashSplit(survivors, "doc_id",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .filter(col("split") === "train")
      PipelineOps.packShards(
          train.select(col("doc_id"),
            TextOps.tokenCount(col("text")).as("n_tokens")),
          "doc_id", "n_tokens", budget = 2000L)
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
        .orderBy("shard")
    }),

    // Coverage-based corpus TRIM: d44's repeated-substring coverage made
    // a curation DECISION — docs with >50% of their text inside
    // cross-doc template material get cut; per-source kept/dropped
    // manifest with token budgets. The boundary compares the 1e-6-grid
    // cov6 value, so the keep set is engine-exact.
    "p23_coverage_trim" -> ((s, d) => {
      import graft.ops.DedupOps
      val docs = Tables.documents(s, d)
      val cov = DedupOps.repeatedNgramCoverage(docs, "doc_id", "text",
        n = 5)
      docs.join(cov.select(col("doc_id"), col("cov6")), "doc_id")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("cov6") <= 0.5, 1L).otherwise(0L)).as("n_kept"),
          sum(when(col("cov6") <= 0.5, TextOps.tokenCount(col("text")))
            .otherwise(0L)).as("kept_tokens"))
        .withColumn("drop_rate6", TextOps.round6(
          (col("n_docs") - col("n_kept")).cast("double")
            / col("n_docs").cast("double")))
        .orderBy("source")
    }),

    // ONE-ROW dataset release card: the top-of-README numbers a corpus
    // ships with — docs, tokens, language/source spread, mean quality,
    // near-dup exposure — p05's per-source card collapsed corpus-wide
    // and joined with d39's dup set, all in one aggregate + one bounded
    // scalar.
    "p22_dataset_card" -> ((s, d) => {
      import graft.ops.DedupOps
      val docs = Tables.documents(s, d)
      val pairs = DedupOps.jaccardPairs(docs, "doc_id", "text",
        n = 3, threshold = 0.5)
      val dup = pairs.select(col("id1").as("i"))
        .unionByName(pairs.select(col("id2").as("i")))
        .distinct().count() // bounded: the dup-doc set
      docs.agg(
          count(lit(1)).as("n_docs"),
          sum(TextOps.tokenCount(col("text"))).as("n_tokens"),
          countDistinct(col("lang")).as("n_langs"),
          countDistinct(col("source")).as("n_sources"),
          // s58/s59 doctrine: a corpus-wide MEAN of 6dp-grid doubles can
          // land exactly on a 1e-6 halfway point, where parallel-sum
          // association drift flips any fixed rounding grid — shift off
          // the grid by a 9dp constant on BOTH sides before rounding.
          TextOps.round6(avg(TextOps.qualityScore(col("text")))
            + lit(0.123456789)).as("mean_quality"))
        .withColumn("n_dup_docs", lit(dup))
        .withColumn("dup_rate6", TextOps.round6(
          lit(dup).cast("double") / col("n_docs").cast("double")))
    }),

    // Deterministic 5-fold CV assignment: per (fold, source) doc counts
    // + fold share — the leakage-free-by-id cross-validation manifest.
    "p21_kfold" -> ((s, d) => {
      val folded = PipelineOps.kfold(Tables.documents(s, d), "doc_id",
        k = 5)
      val total = folded.count() // 1-value probe: corpus size
      folded.groupBy("fold", "source")
        .agg(count(lit(1)).as("n_docs"))
        .withColumn("share6", graft.ops.TextOps.round6(
          col("n_docs").cast("double") / lit(total.toDouble)))
        .orderBy("fold", "source")
    }),

    // Content-addressed snapshot diff: v1 drops ids ≡7 (mod 10), v2
    // drops ≡3 and amends ≡5 — the added/removed/changed/unchanged
    // manifest a dataset-versioning release pipeline ships. Hashes
    // shuffle, bodies never do.
    "p20_snapshot_diff" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val before = docs.filter(pmod(col("doc_id"), lit(10)) =!= 7)
      val after = docs.filter(pmod(col("doc_id"), lit(10)) =!= 3)
        .withColumn("text", when(pmod(col("doc_id"), lit(10)) === 5,
          concat(col("text"), lit(" amended"))).otherwise(col("text")))
      PipelineOps.snapshotDiff(before, after, "doc_id", "text")
        .orderBy("doc_id")
    }),

    // MERGE/upsert (SCD-1) — the action on p20's diff: an update batch
    // (every doc_id % 10 == 5 re-crawled with amended text, plus three
    // brand-new synthetic docs) applied to the base snapshot in ONE
    // key-anti-join + union; matched keys replaced, unmatched base rows
    // untouched, new keys inserted. Text compared by md5 fingerprint.
    "p24_upsert" -> ((s, d) => {
      import s.implicits._
      val base = Tables.documents(s, d).select("doc_id", "source", "text")
      val updates = Tables.documents(s, d)
        .filter(pmod(col("doc_id"), lit(10)) === 5)
        .select(col("doc_id"), col("source"),
          concat(col("text"), lit(" amended")).as("text"))
        .unionByName(Seq(
          (-1L, "recrawl", "fresh doc one"),
          (-2L, "recrawl", "fresh doc two"),
          (-3L, "recrawl", "fresh doc three"))
          .toDF("doc_id", "source", "text"))
      PipelineOps.upsert(base, updates, Seq("doc_id"))
        .select(col("doc_id"), col("source"),
          md5(encode(col("text"), "UTF-8")).as("fp"))
        .orderBy("doc_id")
    }),

    // CDC APPLY — p24 with deletes: a change batch of amended rows
    // ('U', doc_id % 10 == 5), tombstones ('D', doc_id % 10 == 7), and
    // two brand-new inserts applied in ONE key-anti-join + filtered
    // union; touched keys leave the base exactly once.
    "p25_apply_cdc" -> ((s, d) => {
      import s.implicits._
      val base = Tables.documents(s, d).select("doc_id", "source", "text")
      val docs = Tables.documents(s, d)
      val changes = docs.filter(pmod(col("doc_id"), lit(10)) === 5)
        .select(col("doc_id"), col("source"),
          concat(col("text"), lit(" amended")).as("text"),
          lit("U").as("op"))
        .unionByName(docs.filter(pmod(col("doc_id"), lit(10)) === 7)
          .select(col("doc_id"), col("source"), col("text"),
            lit("D").as("op")))
        .unionByName(Seq(
          (-1L, "cdc", "fresh doc one", "U"),
          (-2L, "cdc", "fresh doc two", "U"))
          .toDF("doc_id", "source", "text", "op"))
      PipelineOps.applyCdc(base, changes, Seq("doc_id"), "op")
        .select(col("doc_id"), col("source"),
          md5(encode(col("text"), "UTF-8")).as("fp"))
        .orderBy("doc_id")
    }),

    // CDC COMPACTION — lifting p25's one-row-per-key caller contract: a
    // raw multi-op out-of-order change LOG (amend → delete → re-amend
    // per %10==5 key; amend → delete per %10==7; two versions of one
    // fresh insert; a delete of a key that never existed) compacts to
    // last-writer-wins by the seq column in ONE max_by partial+final
    // aggregation, then applies. Oracle replays compaction as a DuckDB
    // rank window — a deliberately different spelling of the same rule.
    "p26_cdc_compact" -> ((s, d) =>
      PipelineOps.applyCdcLog(
          Tables.documents(s, d).select("doc_id", "source", "text"),
          cdcChangeLog(s, d), Seq("doc_id"), "op", "seq")
        .select(col("doc_id"), col("source"),
          md5(encode(col("text"), "UTF-8")).as("fp"))
        .orderBy("doc_id")),

    // STREAMING CDC — p26's merge fed as a MemoryStream replay in THREE
    // seq-adversarial micro-batches (all seq-3 rows first, then seq-1,
    // then seq-2: late arrivals with LOWER sequence numbers than the
    // state's winner): cdcIngest folds each batch into a one-row-per-key
    // compacted state (tombstones retained — a late lower-seq update
    // must not resurrect a deleted key), and the closing applyCdc
    // against the batch base must hash-match p26's all-at-once answer —
    // batch boundaries and arrival order provably change nothing.
    // Oracle: p26's SQL VERBATIM (the e57 shared-oracle doctrine).
    "p29_stream_cdc" -> ((s, d) => {
      implicit val sqlCtx = s.sqlContext
      import s.implicits._
      val rows = graft.Caches.memo(s"replay:cdclog:$d") {
        cdcChangeLog(s, d)
          .collect() // CDC replay log — ≤ 3 ops × |documents|/10 + 3 rows
          .map(r => (r.getLong(0), r.getString(1), r.getString(2),
            r.getString(3), r.getLong(4))).toVector
      }
      val input = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, String, String, String, Long)]
      var state: () => DataFrame = null
      withStatePartitions(s, 4) {
        val (q, reader) = graft.streaming.StreamOps.cdcIngest(
          input.toDF().toDF("doc_id", "source", "text", "op", "seq"),
          Seq("doc_id"), "seq")
        state = reader
        try {
          Seq(3L, 1L, 2L).foreach { sq =>
            input.addData(rows.filter(_._5 == sq): _*)
            q.processAllAvailable()
          }
        } finally q.stop()
      }
      PipelineOps.applyCdc(
          Tables.documents(s, d).select("doc_id", "source", "text"),
          state().drop("seq"), Seq("doc_id"), "op")
        .select(col("doc_id"), col("source"),
          md5(encode(col("text"), "UTF-8")).as("fp"))
        .orderBy("doc_id")
    }),

    // CURATION PIPELINE v2 — the capstone composing this round's three
    // new capabilities: strip cross-doc boilerplate at ExactSubstr
    // granularity (d49), keep only docs the distilled quality
    // classifier accepts (t37's model, memo-shared), route by language
    // with the 'und' quarantine dropped (t33). Every stage is keyed by
    // doc_id — three equi-joins, no corpus-global state; the surviving
    // corpus ships as cleaned-text fingerprints.
    "p35_curation_v2" -> ((s, d) => {
      import graft.ops.{DedupOps, TextOps}
      val docs = Tables.documents(s, d)
      val cleaned = DedupOps.exactSubstrDedup(docs, "doc_id", "text",
        k = 50)
      val scored = TextOps.textClassifierScore(docs, "doc_id", "text",
        when(TextOps.qualityScore(col("text")) >= 0.5, 1L).otherwise(0L),
        dim = 16, iters = 8, memoKey = Some(s"docs-quality:$d"))
      val routed = docs.select(col("doc_id"),
        TextOps.langIdRouted(col("text")).as("route"))
      cleaned
        .join(scored.select("doc_id", "pred"), Seq("doc_id"))
        .join(routed, Seq("doc_id"))
        .filter(col("pred") === 1 && col("kept") >= 10
          && col("route") =!= "und")
        .select(col("doc_id"), col("route"), col("n_tokens"), col("kept"),
          md5(encode(col("clean_text"), "UTF-8")).as("fp"))
        .orderBy("doc_id")
    }),

    // STREAMING CDC → VERSIONED COMMITS — the p29 + p32 stitch: p26's
    // log replayed in THREE seq-adversarial micro-batches (all seq-3
    // rows first, then seq-1, then seq-2), each landing as ONE tagged
    // commitCdc of the compacted state's touched slice. The FINAL
    // version (4) must hash-match p32's all-at-once CDC answer, and the
    // INTERMEDIATE version (3) — read back through time travel AFTER
    // the later commit landed — must equal the prefix state (seqs
    // {3,1} compacted and applied): batch boundaries become pinned,
    // replayable table versions. Exactly-once via epoch tags.
    "p34_stream_cdc_commit" -> ((s, d) => {
      implicit val sqlCtx = s.sqlContext
      import s.implicits._
      val rows = graft.Caches.memo(s"replay:cdclog:$d") {
        cdcChangeLog(s, d)
          .collect() // CDC replay log — ≤ 3 ops × |documents|/10 + 3 rows
          .map(r => (r.getLong(0), r.getString(1), r.getString(2),
            r.getString(3), r.getLong(4))).toVector
      }
      val root = java.nio.file.Files
        .createTempDirectory("graft_p34_tbl").toString
      val tbl = s"$root/tbl"
      graft.sources.VersionedTable.commitCreate(
        Tables.documents(s, d).select("doc_id", "source", "text"),
        tbl, "doc_id", buckets = 8)
      val input = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, String, String, String, Long)]
      withStatePartitions(s, 4) {
        val (q, _) = graft.streaming.StreamOps.cdcCommitIngest(
          input.toDF().toDF("doc_id", "source", "text", "op", "seq"),
          tbl, "doc_id", "seq", "op")
        try {
          Seq(3L, 1L, 2L).foreach { sq =>
            input.addData(rows.filter(_._5 == sq): _*)
            q.processAllAvailable()
          }
        } finally q.stop()
      }
      def rd(v: Int) = graft.sources.VersionedTable.readVersion(s, tbl, v)
        .select(lit(v).as("version"), col("doc_id"), col("source"),
          md5(encode(col("text"), "UTF-8")).as("fp"))
      val res = rd(3).unionByName(rd(4))
        .orderBy("version", "doc_id")
        .localCheckpoint(true)
      val p = new org.apache.hadoop.fs.Path(root)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      res
    }),

    // FULL conditional MERGE INTO — the complete Delta clause matrix
    // (p24's upsert and p32's CDC apply are its unconditional special
    // cases): WHEN MATCHED AND src.text='DELETE' THEN DELETE; WHEN
    // MATCHED AND len(src)>len(base) THEN UPDATE (the %10==3 shortened
    // rows exercise the ELSE-keep); WHEN NOT MATCHED AND
    // src.source='recrawl' THEN INSERT (the 'staging' row drops); WHEN
    // NOT MATCHED BY SOURCE AND doc_id%10==9 THEN DELETE (the retention
    // purge of rows the batch no longer carries). One full-outer keyed
    // join + one decision expression.
    "p37_merge_matrix" -> ((s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d).select("doc_id", "source", "text")
      def m(k: Int) = docs.filter(pmod(col("doc_id"), lit(10)) === k)
      val src = m(5).select(col("doc_id"), col("source"),
          concat(col("text"), lit(" amended longer text")).as("text"))
        .unionByName(m(3).select(col("doc_id"), col("source"),
          substring(col("text"), 1, 5).as("text")))
        .unionByName(m(7).select(col("doc_id"), col("source"),
          lit("DELETE").as("text")))
        .unionByName(Seq(
          (-1L, "recrawl", "fresh doc one"),
          (-2L, "staging", "skip me"))
          .toDF("doc_id", "source", "text"))
      PipelineOps.mergeInto(docs, src, Seq("doc_id"),
          matchedDeleteWhen = Some((_, sc) =>
            sc.getField("text") === "DELETE"),
          matchedUpdateWhen = Some((b, sc) =>
            length(sc.getField("text")) > length(b.getField("text"))),
          insertWhen = Some(sc => sc.getField("source") === "recrawl"),
          notMatchedBySourceDeleteWhen = Some(b =>
            pmod(b.getField("doc_id"), lit(10)) === 9))
        .select(col("doc_id"), col("source"),
          md5(encode(col("text"), "UTF-8")).as("fp"))
        .orderBy("doc_id")
    }),

    // VERSIONED-TABLE CHANGE FEED — the streaming READ completing p34's
    // write loop ("the table as a stream"): p27's commit sequence
    // replays WHILE a readStream over the manifests dir is live; each
    // committed version arrives as one micro-batch carrying only the
    // CHANGED buckets' rows (O(changed) IO — the p31 pruning rule), and
    // a downstream consumer reconstructs every snapshot by replacing
    // changed buckets in its running state. The reconstructed v1/v2
    // must equal time travel exactly — p27's oracle VERBATIM (the e57
    // rule).
    "p36_table_change_feed" -> ((s, d) => {
      import s.implicits._
      import graft.sources.VersionedTable
      val root = java.nio.file.Files
        .createTempDirectory("graft_p36_tbl").toString
      val tbl = s"$root/tbl"
      val base = Tables.documents(s, d).select("doc_id", "source", "text")
      VersionedTable.commitCreate(base, tbl, "doc_id", buckets = 8)
      // downstream consumer: per version, swap the changed buckets into
      // the running state (bucketOf re-derives routing from the key);
      // each snapshot pins with an eager localCheckpoint
      val snaps = scala.collection.mutable.Map.empty[Int, DataFrame]
      var state: DataFrame = null
      val q = graft.streaming.StreamOps.tableChangeFeed(s, tbl) {
        (v, changed, rows) =>
          val next =
            if (state == null) rows
            else state.filter(!VersionedTable.bucketOf("doc_id", 8)
                .isin(changed.toSeq: _*))
              .unionByName(rows)
          state = next.localCheckpoint(true)
          snaps(v) = state
          ()
      }
      try {
        q.processAllAvailable() // v1 discovered + reconstructed
        val updates = Tables.documents(s, d)
          .filter(pmod(col("doc_id"), lit(10)) === 5)
          .select(col("doc_id"), col("source"),
            concat(col("text"), lit(" amended")).as("text"))
          .unionByName(Seq(
            (-1L, "recrawl", "fresh doc one"),
            (-2L, "recrawl", "fresh doc two"),
            (-3L, "recrawl", "fresh doc three"))
            .toDF("doc_id", "source", "text"))
        VersionedTable.commitUpsert(s, tbl, updates, "doc_id")
        q.processAllAvailable() // v2 streams in as its changed buckets
      } finally q.stop()
      def snap(v: Int) = snaps(v).select(lit(v).as("version"),
        col("doc_id"), col("source"),
        md5(encode(col("text"), "UTF-8")).as("fp"))
      val res = snap(1).unionByName(snap(2))
        .orderBy("version", "doc_id")
        .localCheckpoint(true)
      val p = new org.apache.hadoop.fs.Path(root)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      res
    }),

    // RESTART-DURABLE CHANGE FEED — p36's consumer with a DURABLE
    // seen-map (checkpointLocation): instance A delivers v1+v2 and
    // DIES; v3 commits while nobody is listening; instance B restarts
    // over the SAME checkpoint and must resume at EXACTLY v3 (never
    // re-delivering v1/v2 — the exactly-once-across-restart contract),
    // its bucket-replacement state carried over. Output = the final
    // reconstruction (must equal time travel to v3) + the delivery
    // audit pinned as a literal column ("a1,a2,b3").
    "p40_feed_restart" -> ((s, d) => {
      import s.implicits._
      import graft.sources.VersionedTable
      val root = java.nio.file.Files
        .createTempDirectory("graft_p40_tbl").toString
      val tbl = s"$root/tbl"
      val ckpt = s"$root/ckpt"
      val base = Tables.documents(s, d).select("doc_id", "source", "text")
      VersionedTable.commitCreate(base, tbl, "doc_id", buckets = 8)
      VersionedTable.commitUpsert(s, tbl,
        Tables.documents(s, d)
          .filter(pmod(col("doc_id"), lit(10)) === 5)
          .select(col("doc_id"), col("source"),
            concat(col("text"), lit(" amended")).as("text"))
          .unionByName(Seq(
            (-1L, "recrawl", "fresh doc one"),
            (-2L, "recrawl", "fresh doc two"),
            (-3L, "recrawl", "fresh doc three"))
            .toDF("doc_id", "source", "text")), "doc_id")
      var state: DataFrame = null
      val log = scala.collection.mutable.ArrayBuffer.empty[String]
      def consume(instance: String): Unit = {
        val q = graft.streaming.StreamOps.tableChangeFeed(s, tbl,
          Some(ckpt)) { (v, changed, rows) =>
          val next =
            if (state == null) rows
            else state.filter(!VersionedTable.bucketOf("doc_id", 8)
                .isin(changed.toSeq: _*))
              .unionByName(rows)
          state = next.localCheckpoint(true)
          log += s"$instance$v"
          ()
        }
        try q.processAllAvailable() finally q.stop()
      }
      consume("a") // delivers v1, v2, then dies
      VersionedTable.commitUpsert(s, tbl, // v3 lands while nobody listens
        Tables.documents(s, d)
          .filter(pmod(col("doc_id"), lit(10)) === 2)
          .select(col("doc_id"), col("source"),
            concat(col("text"), lit(" amended again")).as("text")),
        "doc_id")
      consume("b") // the durable seen-map resumes at exactly v3
      val res = state.select(lit(log.mkString(",")).as("delivered"),
          col("doc_id"), col("source"),
          md5(encode(col("text"), "UTF-8")).as("fp"))
        .orderBy("doc_id")
        .localCheckpoint(true)
      val p = new org.apache.hadoop.fs.Path(root)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      res
    }),

    // INCREMENTAL VIEW MAINTENANCE over the CHANGE FEED — the
    // materialized-view loop a downstream dashboard runs on the
    // versioned table: the consumer keeps ONLY a (bucket, source) count
    // state (|buckets| × |sources| rows — never doc-level), and per
    // streamed version replaces the changed buckets' count slices with
    // the delta rows' fresh counts (bucketOf re-derives routing).
    // After p27's commit sequence the maintained view must equal the
    // batch GROUP BY over the final version — without ever re-reading
    // the unchanged buckets.
    "p39_feed_ivm" -> ((s, d) => {
      import s.implicits._
      import graft.sources.VersionedTable
      val root = java.nio.file.Files
        .createTempDirectory("graft_p39_tbl").toString
      val tbl = s"$root/tbl"
      val base = Tables.documents(s, d).select("doc_id", "source", "text")
      VersionedTable.commitCreate(base, tbl, "doc_id", buckets = 8)
      var view: DataFrame = null // (bucket, source, cnt) — the MV state
      val q = graft.streaming.StreamOps.tableChangeFeed(s, tbl) {
        (_, changed, rows) =>
          val delta = rows
            .select(VersionedTable.bucketOf("doc_id", 8).as("__b"),
              col("source"))
            .groupBy("__b", "source").agg(count(lit(1)).as("cnt"))
          view = (if (view == null) delta
                  else view.filter(!col("__b").isin(changed.toSeq: _*))
                    .unionByName(delta))
            .localCheckpoint(true) // bounded: |buckets| × |sources| rows
          ()
      }
      try {
        q.processAllAvailable() // v1 seeds the view
        val updates = Tables.documents(s, d)
          .filter(pmod(col("doc_id"), lit(10)) === 5)
          .select(col("doc_id"), col("source"),
            concat(col("text"), lit(" amended")).as("text"))
          .unionByName(Seq(
            (-1L, "recrawl", "fresh doc one"),
            (-2L, "recrawl", "fresh doc two"),
            (-3L, "recrawl", "fresh doc three"))
            .toDF("doc_id", "source", "text"))
        VersionedTable.commitUpsert(s, tbl, updates, "doc_id")
        q.processAllAvailable() // v2's changed buckets refresh the view
      } finally q.stop()
      val res = view.groupBy("source").agg(sum(col("cnt")).as("n_docs"))
        .orderBy("source")
        .localCheckpoint(true)
      val p = new org.apache.hadoop.fs.Path(root)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      res
    }),

    // TIMESTAMP AS OF — Delta-style time travel by WALL CLOCK: the
    // newest version whose manifest landed at or before the asked
    // instant (the atomic claim+rename IS the commit instant, so the
    // manifest mtime is authoritative). The gate replays p27's commit
    // sequence, PINS the two commit instants to known epochs
    // (fs.setTimes — deterministic regardless of machine speed), and
    // reads the table as of a moment between the commits and a moment
    // after both: must equal v1 and v2 exactly — p27's oracle VERBATIM.
    "p38_version_as_of" -> ((s, d) => {
      import s.implicits._
      import graft.sources.VersionedTable
      val root = java.nio.file.Files
        .createTempDirectory("graft_p38_tbl").toString
      val tbl = s"$root/tbl"
      val base = Tables.documents(s, d).select("doc_id", "source", "text")
      VersionedTable.commitCreate(base, tbl, "doc_id", buckets = 8)
      val updates = Tables.documents(s, d)
        .filter(pmod(col("doc_id"), lit(10)) === 5)
        .select(col("doc_id"), col("source"),
          concat(col("text"), lit(" amended")).as("text"))
        .unionByName(Seq(
          (-1L, "recrawl", "fresh doc one"),
          (-2L, "recrawl", "fresh doc two"),
          (-3L, "recrawl", "fresh doc three"))
          .toDF("doc_id", "source", "text"))
      VersionedTable.commitUpsert(s, tbl, updates, "doc_id")
      // pin commit instants: v1 at t=1000, v2 at t=2000 (epoch millis)
      val fs = new org.apache.hadoop.fs.Path(tbl)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.setTimes(new org.apache.hadoop.fs.Path(s"$tbl/manifests/v1.txt"),
        1000L, -1L)
      fs.setTimes(new org.apache.hadoop.fs.Path(s"$tbl/manifests/v2.txt"),
        2000L, -1L)
      def asOf(ts: Long) = {
        val v = VersionedTable.versionAsOf(s, tbl, ts)
        VersionedTable.readVersion(s, tbl, v)
          .select(lit(v).as("version"), col("doc_id"), col("source"),
            md5(encode(col("text"), "UTF-8")).as("fp"))
      }
      val res = asOf(1500L).unionByName(asOf(2500L))
        .orderBy("version", "doc_id")
        .localCheckpoint(true)
      val p = new org.apache.hadoop.fs.Path(root)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      res
    }),

    // TIME TRAVEL — the versioned-table read the in-place p24/p25
    // merges can't give: commit v1 (8 key-buckets), commit an upsert as
    // v2 (only touched buckets rewritten; untouched buckets' files
    // carried over by manifest reference — SourcesSpec asserts the
    // sharing), then read BOTH versions back: v1 must equal the
    // original snapshot bit-for-bit even though v2 has landed, v2 must
    // equal the merged table. Unique temp dir + localCheckpoint +
    // delete (the f72 artifact discipline).
    "p27_time_travel" -> ((s, d) => {
      import s.implicits._
      import graft.sources.VersionedTable
      val root = java.nio.file.Files
        .createTempDirectory("graft_p27_tbl").toString
      val tbl = s"$root/tbl"
      val base = Tables.documents(s, d).select("doc_id", "source", "text")
      VersionedTable.commitCreate(base, tbl, "doc_id", buckets = 8)
      val updates = Tables.documents(s, d)
        .filter(pmod(col("doc_id"), lit(10)) === 5)
        .select(col("doc_id"), col("source"),
          concat(col("text"), lit(" amended")).as("text"))
        .unionByName(Seq(
          (-1L, "recrawl", "fresh doc one"),
          (-2L, "recrawl", "fresh doc two"),
          (-3L, "recrawl", "fresh doc three"))
          .toDF("doc_id", "source", "text"))
      VersionedTable.commitUpsert(s, tbl, updates, "doc_id")
      def rd(v: Int) = VersionedTable.readVersion(s, tbl, v)
        .select(lit(v).as("version"), col("doc_id"), col("source"),
          md5(encode(col("text"), "UTF-8")).as("fp"))
      val res = rd(1).unionByName(rd(2))
        .orderBy("version", "doc_id")
        .localCheckpoint(true)
      val p = new org.apache.hadoop.fs.Path(root)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      res
    }),

    // VERSION DIFF across a 3-commit history — the audit query a
    // versioned table exists for ("what changed since the release
    // snapshot"): v2 amends %10==5 + inserts 3 docs, v3 amends %10==3
    // + inserts 1 more; p20's content-hash diff then runs over the
    // manifest-pinned reads v1→v2 and v1→v3 (the latter must show BOTH
    // change sets accumulated — historical reads don't decay as
    // commits land). Diff payloads are 16-byte md5s, never bodies.
    "p28_version_diff" -> ((s, d) => {
      import graft.sources.VersionedTable
      val root = java.nio.file.Files
        .createTempDirectory("graft_p28_tbl").toString
      val tbl = threeVersionTable(s, d, root)
      def rd(v: Int) = VersionedTable.readVersion(s, tbl, v)
      val res = PipelineOps.snapshotDiff(rd(1), rd(2), "doc_id", "text")
        .select(lit("v1v2").as("pair"), col("doc_id"), col("status"))
        .unionByName(
          PipelineOps.snapshotDiff(rd(1), rd(3), "doc_id", "text")
            .select(lit("v1v3").as("pair"), col("doc_id"), col("status")))
        .orderBy("pair", "doc_id")
        .localCheckpoint(true)
      val p = new org.apache.hadoop.fs.Path(root)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      res
    }),

    // CDC COMMIT — MERGE INTO with time travel, stitching the round's
    // two tails together: p26's multi-op log compacts to last-writer-
    // wins rows, commitCdc applies them (tombstones DELETE) as version
    // 2 of the manifest-pinned table, touched buckets only — and
    // version 1 still reads back as the untouched snapshot. Output:
    // both versions; v2 must equal p26's merge result exactly.
    "p32_cdc_commit" -> ((s, d) => {
      import graft.sources.VersionedTable
      val root = java.nio.file.Files
        .createTempDirectory("graft_p32_tbl").toString
      val tbl = s"$root/tbl"
      VersionedTable.commitCreate(
        Tables.documents(s, d).select("doc_id", "source", "text"),
        tbl, "doc_id", buckets = 8)
      VersionedTable.commitCdc(s, tbl,
        PipelineOps.compactCdc(cdcChangeLog(s, d), Seq("doc_id"), "seq"),
        "doc_id", "op")
      def rd(v: Int) = VersionedTable.readVersion(s, tbl, v)
        .select(lit(v).as("version"), col("doc_id"), col("source"),
          md5(encode(col("text"), "UTF-8")).as("fp"))
      val res = rd(1).unionByName(rd(2))
        .orderBy("version", "doc_id")
        .localCheckpoint(true)
      val p = new org.apache.hadoop.fs.Path(root)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      res
    }),

    // SCHEMA EVOLUTION + time travel — the other headline table-format
    // capability: v2's update batch carries a NEW column (quality =
    // length of the amended text); rewritten buckets take the widened
    // schema, untouched buckets keep the old one, and readVersion's
    // mergeSchema read reconciles — v2 surfaces quality with nulls on
    // every non-updated row while v1 keeps its ORIGINAL 3-column
    // schema (SourcesSpec asserts the absence — the schema itself
    // time-travels). Output: v2 with the evolved column.
    "p33_schema_evolution" -> ((s, d) => {
      import graft.sources.VersionedTable
      val root = java.nio.file.Files
        .createTempDirectory("graft_p33_tbl").toString
      val tbl = s"$root/tbl"
      VersionedTable.commitCreate(
        Tables.documents(s, d).select("doc_id", "source", "text"),
        tbl, "doc_id", buckets = 8)
      val updates = Tables.documents(s, d)
        .filter(pmod(col("doc_id"), lit(10)) === 5)
        .select(col("doc_id"), col("source"),
          concat(col("text"), lit(" amended")).as("text"))
        .withColumn("quality", length(col("text")).cast("long"))
      VersionedTable.commitUpsert(s, tbl, updates, "doc_id",
        evolve = true)
      val res = VersionedTable.readVersion(s, tbl, 2)
        .select(col("doc_id"), md5(encode(col("text"), "UTF-8")).as("fp"),
          col("quality"))
        .orderBy("doc_id")
        .localCheckpoint(true)
      val p = new org.apache.hadoop.fs.Path(root)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      res
    }),

    // VACUUM — storage reclamation closing the versioned-table
    // lifecycle (commit → time travel → diff → VACUUM): keep the newest
    // 2 of 3 versions, drop v1's manifest, delete exactly the bucket
    // dirs no kept manifest references — then BOTH kept versions must
    // read back intact (v2 with v1's carried-over files where shared
    // forward, v3 on top). The gate's contract is the survivors'
    // content; OpsSpec asserts the deletion/refusal details.
    "p30_vacuum" -> ((s, d) => {
      import graft.sources.VersionedTable
      val root = java.nio.file.Files
        .createTempDirectory("graft_p30_tbl").toString
      val tbl = threeVersionTable(s, d, root)
      VersionedTable.vacuum(s, tbl, keepLast = 2)
      def rd(v: Int) = VersionedTable.readVersion(s, tbl, v)
        .select(lit(v).as("version"), col("doc_id"), col("source"),
          md5(encode(col("text"), "UTF-8")).as("fp"))
      val res = rd(2).unionByName(rd(3))
        .orderBy("version", "doc_id")
        .localCheckpoint(true)
      val p = new org.apache.hadoop.fs.Path(root)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      res
    }),

    // INCREMENTAL CHANGES READ — the CDC-read primitive: sync v1 → v3
    // touching ONLY the buckets the manifests disagree on (identical
    // manifest entry ⇒ identical immutable bytes ⇒ pruned before any
    // IO); within the rewritten buckets the content diff drops the
    // co-resident unchanged rows. Must equal the full-table diff's
    // non-unchanged rows exactly — at a fraction of the read.
    "p31_incremental_read" -> ((s, d) => {
      import graft.sources.VersionedTable
      val root = java.nio.file.Files
        .createTempDirectory("graft_p31_tbl").toString
      val tbl = threeVersionTable(s, d, root)
      val res = VersionedTable
        .readChanges(s, tbl, 1, 3, "doc_id", "text")
        .orderBy("doc_id")
        .localCheckpoint(true)
      val p = new org.apache.hadoop.fs.Path(root)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      res
    }),

    // Deterministic weighted sample WITHOUT replacement (Efraimidis–
    // Spirakis A-ES): 500 docs with inclusion odds ∝ text length, key =
    // −ln(md5-uniform)/w — engine-portable arithmetic (the d05 hash
    // trick), planned as TakeOrderedAndProject (per-partition top-n
    // heaps, no corpus shuffle).
    "p07_weighted_sample" -> ((s, d) =>
      PipelineOps.weightedSample(Tables.documents(s, d), "doc_id",
          length(col("text")) + lit(1), n = 500, salt = "ws")
        .select("doc_id", "source")
        .orderBy("doc_id")),

    // Length histogram: power-of-2 token buckets via integer indicator
    // sums (log2 would flip at exact powers under 1-ulp drift).
    "p10_length_hist" -> ((s, d) =>
      PipelineOps.lengthHistogram(Tables.documents(s, d),
          TextOps.tokenCount(col("text")))
        .orderBy("bucket")),

    // Multi-epoch replay schedule: salted-rotation mixture per epoch on
    // ONE corpus scan (explode of per-epoch keep indicators).
    "p09_epoch_schedule" -> ((s, d) =>
      PipelineOps.epochSchedule(Tables.documents(s, d), "doc_id", "source",
          Map("src0" -> 1.0, "src1" -> 0.5), defaultRate = 0.25,
          epochs = 3)
        .orderBy("epoch", "stratum")),

    // Curriculum manifest: stage from declared quality-band edges over
    // the GRID-SNAPPED (round6) score so a 1-ulp engine drift can't flip
    // an edge compare; shard = portable md5 slot; one aggregation.
    "p08_curriculum" -> ((s, d) =>
      PipelineOps.curriculumManifest(Tables.documents(s, d), "doc_id",
          TextOps.round6(TextOps.qualityScore(col("text"))),
          TextOps.tokenCount(col("text")),
          edges = Seq(0.3, 0.5), shards = 8)
        .orderBy("stage", "shard"))
  )

  private val Toks = "list_filter(string_split(lower(text), ' '), t -> t <> '')"

  /** p27/p36 shared oracle: v1 = the untouched snapshot, v2 = the
    * upsert — the time-travel contract expressed directly. p36's
    * change-feed reconstruction answers the identical question, so it
    * re-registers this SQL verbatim (the e57 rule). */
  private val TimeTravelSql: String =
    """WITH upd AS (
           SELECT doc_id, source, text || ' amended' AS text
           FROM documents WHERE doc_id % 10 = 5
           UNION ALL
           SELECT * FROM (VALUES
             (CAST(-1 AS BIGINT), 'recrawl', 'fresh doc one'),
             (CAST(-2 AS BIGINT), 'recrawl', 'fresh doc two'),
             (CAST(-3 AS BIGINT), 'recrawl', 'fresh doc three'))
             t(doc_id, source, text)),
         v2 AS (
           SELECT doc_id, source, text FROM documents
           WHERE doc_id NOT IN (SELECT doc_id FROM upd)
           UNION ALL SELECT doc_id, source, text FROM upd)
         SELECT version, doc_id, source, fp FROM (
           SELECT 1 AS version, doc_id, source, md5(text) AS fp
           FROM documents
           UNION ALL
           SELECT 2, doc_id, source, md5(text) FROM v2)
         ORDER BY version, doc_id"""

  /** p26/p29 shared oracle: last-writer-wins as a DuckDB rank
    * window over the multi-op log, then the anti-join + filtered
    * union close. */
  /** The CTE prefix of [[CdcCompactSql]] (`chg` = the multi-op log,
    * `lw` = its rank-window last-writer-wins compaction) — shared with
    * p32's versioned-commit oracle. */
  private val CdcLogCtes =
    """chg AS (
           SELECT doc_id, source, text || ' amended a' AS text,
             'U' AS op, 1 AS seq FROM documents WHERE doc_id % 10 = 5
           UNION ALL
           SELECT doc_id, source, text, 'D', 2
           FROM documents WHERE doc_id % 10 = 5
           UNION ALL
           SELECT doc_id, source, text || ' amended b', 'U', 3
           FROM documents WHERE doc_id % 10 = 5
           UNION ALL
           SELECT doc_id, source, text || ' amended', 'U', 1
           FROM documents WHERE doc_id % 10 = 7
           UNION ALL
           SELECT doc_id, source, text, 'D', 2
           FROM documents WHERE doc_id % 10 = 7
           UNION ALL
           SELECT * FROM (VALUES
             (CAST(-1 AS BIGINT), 'cdc', 'fresh v one', 'U', 1),
             (CAST(-1 AS BIGINT), 'cdc', 'fresh v two', 'U', 2),
             (CAST(-2 AS BIGINT), 'cdc', 'never was', 'D', 1))
             t(doc_id, source, text, op, seq)),
         lw AS (SELECT doc_id, source, text, op FROM (
             SELECT *, row_number() OVER (PARTITION BY doc_id
               ORDER BY seq DESC) AS rk FROM chg)
           WHERE rk = 1),
         applied AS (
           SELECT doc_id, source, text FROM documents
           WHERE doc_id NOT IN (SELECT doc_id FROM lw)
           UNION ALL
           SELECT doc_id, source, text FROM lw WHERE op <> 'D')"""

  private val CdcCompactSql =
    s"""WITH $CdcLogCtes
         SELECT doc_id, source, md5(text) AS fp FROM applied
         ORDER BY doc_id"""

  val oracles: Map[String, String] = Map(
    // p12: every share literal is CAST AS DOUBLE — a bare decimal seeds
    // DuckDB DECIMAL arithmetic (exact 200.00) where the Spark side
    // computes 20000·0.01 in doubles (200.00000000000003); the rate and
    // its 16-bit threshold must come from the IDENTICAL double.
    // p13: the p01 split CASE + d09's shingle-containment core, closed
    // per split; the containment threshold compares the same exact
    // integer-count division on both sides.
    // p19: identical salted keys + per-group rank ≤ k.
    "p19_group_reservoir" ->
      """SELECT source, pick, doc_id FROM (
           SELECT source, doc_id,
             CAST(row_number() OVER (PARTITION BY source
               ORDER BY md5('res:' || CAST(doc_id AS VARCHAR)), doc_id)
               AS INTEGER) AS pick
           FROM documents)
         WHERE pick <= 5 ORDER BY source, pick""",
    // p18: identical salted keys; rank replayed per epoch (md5 keys
    // are unique, so the order is total without a tiebreak).
    "p18_epoch_shuffle" ->
      """WITH e AS (
           SELECT 0 AS epoch, doc_id,
             md5('epoch0:' || CAST(doc_id AS VARCHAR)) AS k
           FROM documents
           UNION ALL
           SELECT 1, doc_id,
             md5('epoch1:' || CAST(doc_id AS VARCHAR))
           FROM documents)
         SELECT epoch, doc_id,
           CAST(row_number() OVER (PARTITION BY epoch ORDER BY k)
             AS BIGINT) AS pos
         FROM e ORDER BY epoch, pos""",
    // p17: p13's CTEs, closed by quarantining the TRAIN side of every
    // ≥τ containment pair instead of counting the eval side.
    "p17_decontam_split" ->
      s"""WITH sp AS (SELECT doc_id, text, CASE
             WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'cccc'
               THEN 'train'
             WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'e666'
               THEN 'val'
             ELSE 'test' END AS split
           FROM documents),
         toks AS (SELECT doc_id, split, $Toks AS ws FROM sp),
         sh AS (SELECT DISTINCT doc_id, split,
             ws[u.i] || ' ' || ws[u.i+1] || ' ' || ws[u.i+2] AS sh
           FROM toks, LATERAL unnest(range(1, len(ws)-1)) AS u(i)),
         b AS (SELECT doc_id AS bench_id, sh FROM sh
           WHERE split <> 'train'),
         c AS (SELECT doc_id AS train_id, sh FROM sh
           WHERE split = 'train'),
         bs AS (SELECT bench_id, count(*) AS bn FROM b GROUP BY 1),
         j AS (SELECT c.train_id, b.bench_id, count(*) AS n_shared
           FROM c JOIN b USING (sh) GROUP BY 1, 2),
         q AS (SELECT DISTINCT j.train_id
           FROM j JOIN bs USING (bench_id)
           WHERE CAST(j.n_shared AS DOUBLE) / bs.bn
             >= CAST(0.8 AS DOUBLE))
         SELECT sp.doc_id,
           CASE WHEN sp.split = 'train' AND q.train_id IS NOT NULL
             THEN 'quarantine' ELSE sp.split END AS split
         FROM sp LEFT JOIN q ON sp.doc_id = q.train_id
         ORDER BY sp.doc_id""",
    "p13_split_leakage" ->
      s"""WITH sp AS (SELECT doc_id, text, CASE
             WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'cccc'
               THEN 'train'
             WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'e666'
               THEN 'val'
             ELSE 'test' END AS split
           FROM documents),
         toks AS (SELECT doc_id, split, $Toks AS ws FROM sp),
         sh AS (SELECT DISTINCT doc_id, split,
             ws[u.i] || ' ' || ws[u.i+1] || ' ' || ws[u.i+2] AS sh
           FROM toks, LATERAL unnest(range(1, len(ws)-1)) AS u(i)),
         b AS (SELECT doc_id AS bench_id, sh FROM sh
           WHERE split <> 'train'),
         c AS (SELECT doc_id AS train_id, sh FROM sh
           WHERE split = 'train'),
         bs AS (SELECT bench_id, count(*) AS bn FROM b GROUP BY 1),
         j AS (SELECT c.train_id, b.bench_id, count(*) AS n_shared
           FROM c JOIN b USING (sh) GROUP BY 1, 2),
         lk AS (SELECT DISTINCT j.bench_id
           FROM j JOIN bs USING (bench_id)
           WHERE CAST(j.n_shared AS DOUBLE) / bs.bn
             >= CAST(0.8 AS DOUBLE))
         SELECT sp.split, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN lk.bench_id IS NOT NULL THEN 1 ELSE 0 END)
             AS BIGINT) AS n_leaked,
           floor(CAST(sum(CASE WHEN lk.bench_id IS NOT NULL THEN 1
               ELSE 0 END) AS DOUBLE) / count(*) * 1e6 + 0.5) / 1e6
             AS leak_rate6
         FROM sp LEFT JOIN lk ON sp.doc_id = lk.bench_id
         WHERE sp.split <> 'train'
         GROUP BY 1 ORDER BY 1""",
    "p12_token_mixture" ->
      s"""WITH t AS (SELECT doc_id, source,
             CAST(len($Toks) AS INTEGER) AS tok,
             substr(md5('tokmix' || CAST(doc_id AS VARCHAR)), 1, 4) AS hx
           FROM documents),
         a AS (SELECT source, CAST(sum(tok) AS BIGINT) AS avail
           FROM t GROUP BY 1),
         r AS (SELECT source, avail,
             20000 * (CASE source
               WHEN 'src0' THEN CAST(0.01 AS DOUBLE)
               WHEN 'src1' THEN CAST(0.1 AS DOUBLE)
               ELSE CAST(0.05 AS DOUBLE) END) AS target
           FROM a),
         th AS (SELECT source, avail,
             CAST(floor(target) AS BIGINT) AS target_tokens,
             CASE WHEN avail <= 0 THEN 0.0
                  WHEN target / avail > 1.0 THEN 1.0
                  ELSE target / avail END AS rate
           FROM r),
         k AS (SELECT t.doc_id, t.source, t.tok
           FROM t JOIN th USING (source)
           WHERE rate >= 1.0 OR t.hx < printf('%04x',
             least(CAST(floor(rate * 65536) AS BIGINT), 65535)))
         SELECT th.source, th.avail AS avail_tokens, th.target_tokens,
           count(*) AS n_kept, CAST(sum(k.tok) AS BIGINT) AS kept_tokens
         FROM k JOIN th USING (source)
         GROUP BY 1, 2, 3 ORDER BY th.source""",
    // thresholds: 0.8*65536 = 52428 = 0xcccc, 0.9*65536 = 58982 = 0xe666;
    // fixed-width lowercase hex compares lexicographically = numerically.
    "p01_hash_split" ->
      """SELECT doc_id, CASE
           WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'cccc' THEN 'train'
           WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'e666' THEN 'val'
           ELSE 'test' END AS split
         FROM documents ORDER BY doc_id""",
    // p15: the oracle reads ALL documents in one pass — hash-matching it
    // from two merged half-reports is the additivity proof.
    "p15_report_merge" ->
      s"""WITH t AS (SELECT source, lang,
             CAST(len($Toks) AS BIGINT) AS tok,
             CAST(floor(least(length(text) / 500.0, 1.0) * greatest(0.0,
               1.0 - (CASE WHEN len($Toks) = 0 THEN 0.0 ELSE
                 len(list_filter($Toks, x -> x IN ('the','a','an','of',
                   'and','to','in','is','on','for','with'))) * 1.0
                 / len($Toks) END) * 2.0)
               * 1e6 + 0.5) AS BIGINT) AS qu
           FROM documents),
         g AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(tok) AS BIGINT) AS n_tokens,
             CAST(sum(qu) AS BIGINT) AS qual_u
           FROM t GROUP BY 1, 2)
         SELECT source, CAST(sum(n_docs) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
           floor(CAST(sum(qual_u) AS DOUBLE) / 1e6 / sum(n_docs) * 1e6
             + 0.5) / 1e6 AS mean_quality,
           CAST(count(*) AS BIGINT) AS n_langs
         FROM g GROUP BY 1 ORDER BY 1""",
    // p14: p02's sequential-prefix shard replay, closed per shard with
    // the commutative mod-2³¹ hash fold (sum order is free by design).
    "p14_shard_manifest" ->
      s"""WITH t AS (SELECT doc_id, text,
             CAST(len($Toks) AS INTEGER) AS n_tokens
           FROM documents),
         c AS (SELECT doc_id, text, n_tokens,
             coalesce(sum(n_tokens) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS st
           FROM t),
         sh AS (SELECT CAST(floor(st / 2000.0) AS BIGINT) AS shard,
             doc_id, n_tokens, text
           FROM c)
         SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           min(doc_id) AS first_id, max(doc_id) AS last_id,
           CAST(sum(CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT)
               % 2147483647)
             % 2147483647 AS BIGINT) AS checksum
         FROM sh GROUP BY 1 ORDER BY 1""",
    "p02_pack_shards" ->
      s"""WITH t AS (SELECT doc_id, CAST(len($Toks) AS INTEGER) AS n_tokens
                     FROM documents),
         c AS (SELECT doc_id, n_tokens,
             coalesce(sum(n_tokens) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS st
           FROM t)
         SELECT doc_id, n_tokens,
           CAST(floor(st / 2000.0) AS BIGINT) AS shard
         FROM c ORDER BY doc_id""",
    // greedy fold replayed per shard: frontier = one row per shard, seeds
    // CAST to BIGINT (a bare 0 would seed INTEGER and drift the compare)
    "p11_pack_sequences" ->
      s"""WITH RECURSIVE t AS (
           SELECT doc_id,
             CAST(concat('0x', substr(md5('pack' ||
               CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 8 AS shard,
             CAST(len($Toks) AS BIGINT) AS tok
           FROM documents),
         r AS (SELECT shard, doc_id, tok,
             row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn
           FROM t),
         p AS (
           SELECT shard, doc_id, tok, rn,
               CAST(0 AS BIGINT) AS seq_id, CAST(0 AS BIGINT) AS seq_pos,
               tok AS cum
             FROM r WHERE rn = 1
           UNION ALL
           SELECT r.shard, r.doc_id, r.tok, r.rn,
               CASE WHEN p.cum > 0 AND p.cum + r.tok > 512
                 THEN p.seq_id + 1 ELSE p.seq_id END,
               CASE WHEN p.cum > 0 AND p.cum + r.tok > 512
                 THEN CAST(0 AS BIGINT) ELSE p.cum END,
               CASE WHEN p.cum > 0 AND p.cum + r.tok > 512
                 THEN r.tok ELSE p.cum + r.tok END
             FROM p JOIN r ON r.shard = p.shard AND r.rn = p.rn + 1)
         SELECT doc_id, shard, seq_id, seq_pos FROM p ORDER BY doc_id""",
    "p03_stratified_sample" ->
      """SELECT doc_id, source FROM documents
         QUALIFY row_number() OVER (PARTITION BY source
           ORDER BY substr(md5('strat' || CAST(doc_id AS VARCHAR)), 1, 4),
             doc_id) <= 5
         ORDER BY doc_id""",
    // p16: the whole derivation replays — √n micro-floors, share/target
    // single fixed-association divisions, threshold hex via printf.
    "p16_temperature_mix" ->
      """WITH d0 AS (SELECT doc_id,
             CASE WHEN doc_id % 7 = 0 THEN source ELSE 'common' END
               AS family
           FROM documents),
         c AS (SELECT family AS src, CAST(count(*) AS BIGINT) AS n
           FROM d0 GROUP BY 1),
         w AS (SELECT src, n,
             CAST(floor(sqrt(CAST(n AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)
               AS wu
           FROM c),
         t AS (SELECT CAST(sum(wu) AS BIGINT) AS s FROM w),
         pl AS (SELECT src, n,
             floor(CAST(wu AS DOUBLE) / s * 1e6 + 0.5) / 1e6 AS share6,
             CAST(floor(CAST(wu AS DOUBLE) / s * 300.0) AS BIGINT)
               AS target
           FROM w, t),
         pt AS (SELECT src, n, share6, target,
             CAST(CASE WHEN target >= n THEN 65536
               ELSE CAST(floor(CAST(target AS DOUBLE) / n * 65536.0)
                 AS BIGINT) END AS BIGINT) AS thresh
           FROM pl)
         SELECT doc_id, family, share6, target
         FROM d0 JOIN pt ON family = pt.src
         WHERE thresh = 65536 OR
           substr(md5('tmix' || CAST(doc_id AS VARCHAR)), 1, 4)
             < printf('%04x', thresh)
         ORDER BY doc_id""",
    // thresholds: 0.75*65536 = 49152 = 0xc000, 0.5 = 0x8000, 0.25 = 0x4000,
    // 0.1 → 6553 = 0x1999; rate 1.0 keeps everything including 'ffff'.
    "p04_source_mixture" ->
      """WITH h AS (SELECT doc_id, source,
             substr(md5('mix' || CAST(doc_id AS VARCHAR)), 1, 4) AS hx
           FROM documents)
         SELECT doc_id, source FROM h
         WHERE CASE source
           WHEN 'src0' THEN TRUE
           WHEN 'src1' THEN hx < 'c000'
           WHEN 'src2' THEN hx < '8000'
           WHEN 'src3' THEN hx < '4000'
           ELSE hx < '1999' END
         ORDER BY doc_id""",
    // quality formula mirrors t02's oracle (incl. its per-doc 6dp round)
    "p05_corpus_report" ->
      s"""WITH t AS (SELECT source, lang, text, $Toks AS ts FROM documents),
         q AS (SELECT source, lang, len(ts) AS ntok,
             floor(least(length(text) / 500.0, 1.0) * greatest(0.0,
               1.0 - (CASE WHEN len(ts) = 0 THEN 0.0 ELSE
                 len(list_filter(ts, x -> x IN ('the','a','an','of','and',
                   'to','in','is','on','for','with'))) * 1.0 / len(ts) END)
                 * 2.0) * 1e6 + 0.5) / 1e6 AS qual
           FROM t)
         SELECT source, count(*) AS n_docs,
           CAST(sum(ntok) AS BIGINT) AS n_tokens,
           floor((avg(qual) + 0.123456789) * 1e6 + 0.5) / 1e6 AS mean_quality,
           count(DISTINCT lang) AS n_langs
         FROM q GROUP BY source ORDER BY source""",
    // composes the d07 survivor CTEs + p01's split threshold (0.8 ->
    // 0xcccc) + p02's ordered prefix sum, then groups per shard.
    "p06_corpus_build" ->
      s"""WITH ${DedupQueries.ShingleCte},
         sizes AS (SELECT doc_id, count(*) AS nsh FROM sh GROUP BY 1),
         losers AS (
           SELECT DISTINCT b.doc_id
           FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
           JOIN sizes s1 ON a.doc_id = s1.doc_id
           JOIN sizes s2 ON b.doc_id = s2.doc_id
           GROUP BY a.doc_id, b.doc_id, s1.nsh, s2.nsh
           HAVING count(*) * 1.0 / (s1.nsh + s2.nsh - count(*)) >= 0.5),
         q AS (SELECT doc_id, text, $Toks AS ts FROM documents),
         surv AS (
           SELECT doc_id, CAST(len(ts) AS INTEGER) AS n_tokens
           FROM q
           WHERE floor(least(length(text) / 500.0, 1.0) * greatest(0.0,
               1.0 - (CASE WHEN len(ts) = 0 THEN 0.0 ELSE
                 len(list_filter(ts, x -> x IN ('the','a','an','of','and',
                   'to','in','is','on','for','with'))) * 1.0 / len(ts) END)
                 * 2.0) * 1e6 + 0.5) / 1e6 >= 0.35
             AND doc_id NOT IN (SELECT doc_id FROM losers)
             AND substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'cccc'),
         c AS (SELECT doc_id, n_tokens,
             coalesce(sum(n_tokens) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS st
           FROM surv)
         SELECT CAST(floor(st / 2000.0) AS BIGINT) AS shard,
           count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS n_tokens
         FROM c GROUP BY 1 ORDER BY 1""",
    // A-ES key in the same spelling Spark executes: u = (h60 + 1) / 2^60
    // from the 60-bit md5 integer (identical double at both ends — both
    // engines round the exact integer to nearest), key = -ln(u)/w.
    "p07_weighted_sample" ->
      """WITH k AS (SELECT doc_id, source,
             -ln((CAST(CAST(concat('0x', substr(md5('ws' ||
                   CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS DOUBLE)
                 + 1.0) / 1152921504606846976.0)
               / (length(text) + 1) AS key
           FROM documents)
         SELECT doc_id, source FROM (
           SELECT doc_id, source FROM k ORDER BY key LIMIT 500)
         ORDER BY doc_id""",
    "p10_length_hist" ->
      s"""WITH t AS (SELECT CAST(len($Toks) AS BIGINT) AS n
             FROM documents),
         b AS (SELECT n,
             ${(1 to 16).map(k => s"(CASE WHEN n >= ${1L << k} THEN 1 ELSE 0 END)")
               .mkString(" + ")} AS bucket
           FROM t)
         SELECT bucket, count(*) AS n_docs, CAST(sum(n) AS BIGINT) AS n_tokens
         FROM b GROUP BY 1 ORDER BY 1""",
    // per-epoch salts ep0/ep1/ep2; 0.5 → 0x8000, 0.25 → 0x4000.
    "p09_epoch_schedule" ->
      """WITH e AS (SELECT unnest(range(0, 3)) AS epoch),
         k AS (SELECT d.doc_id, d.source, e.epoch,
             substr(md5('ep' || CAST(e.epoch AS VARCHAR)
               || CAST(d.doc_id AS VARCHAR)), 1, 4) AS hx
           FROM documents d, e)
         SELECT CAST(epoch AS INTEGER) AS epoch, source AS stratum,
           count(*) AS n_docs
         FROM k
         WHERE CASE source WHEN 'src0' THEN TRUE
           WHEN 'src1' THEN hx < '8000'
           ELSE hx < '4000' END
         GROUP BY 1, 2 ORDER BY 1, 2""",
    // quality spelled exactly as t02's oracle (round6 grid snap), stage =
    // indicator sum, shard = 60-bit md5 mod 8 (h60 ≥ 0, so % == pmod).
    "p08_curriculum" ->
      s"""WITH t AS (SELECT doc_id, text, $Toks AS ts FROM documents),
         q AS (SELECT doc_id,
             floor(least(length(text) / 500.0, 1.0) * greatest(0.0,
               1.0 - (CASE WHEN len(ts) = 0 THEN 0.0 ELSE
                 len(list_filter(ts, x -> x IN ('the','a','an','of','and',
                   'to','in','is','on','for','with'))) * 1.0 / len(ts) END)
                 * 2.0) * 1e6 + 0.5) / 1e6 AS qual,
             CAST(len(ts) AS BIGINT) AS n_tokens
           FROM t),
         a AS (SELECT doc_id,
             (CASE WHEN qual >= 0.3 THEN 1 ELSE 0 END)
               + (CASE WHEN qual >= 0.5 THEN 1 ELSE 0 END) AS stage,
             CAST(concat('0x', substr(md5('curr' ||
               CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 8 AS shard,
             n_tokens
           FROM q)
         SELECT stage, shard, count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens
         FROM a GROUP BY 1, 2 ORDER BY 1, 2""",
    // p23: d44's coverage CTEs (shared spelling) + the keep boundary on
    // the identical 1e-6-grid value + per-source exact-count rollup.
    "p23_coverage_trim" ->
      s"""WITH ${DedupQueries.RepeatedCoverage5Cte},
         cv AS (SELECT t.doc_id,
             floor(COALESCE(covered, 0) * 1.0 / GREATEST(len(ts), 1)
               * 1e6 + 0.5) / 1e6 AS cov6
           FROM t LEFT JOIN per USING (doc_id)),
         tok AS (SELECT doc_id, source, len($Toks) AS nt FROM documents)
         SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN cov6 <= 0.5 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept,
           CAST(sum(CASE WHEN cov6 <= 0.5 THEN nt ELSE 0 END) AS BIGINT)
             AS kept_tokens,
           floor((count(*) - sum(CASE WHEN cov6 <= 0.5 THEN 1 ELSE 0 END))
             * 1.0 / count(*) * 1e6 + 0.5) / 1e6 AS drop_rate6
         FROM tok JOIN cv USING (doc_id) GROUP BY 1 ORDER BY 1""",
    // p22: p05's quality CTEs corpus-wide + d39's dup set, one row.
    "p22_dataset_card" ->
      s"""WITH ${DedupQueries.ShingleCte},
         dup AS (SELECT DISTINCT id FROM (
           SELECT a.doc_id AS id
           FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
           JOIN (SELECT doc_id, count(*) AS nsh FROM sh GROUP BY 1) s1
             ON a.doc_id = s1.doc_id
           JOIN (SELECT doc_id, count(*) AS nsh FROM sh GROUP BY 1) s2
             ON b.doc_id = s2.doc_id
           GROUP BY a.doc_id, b.doc_id, s1.nsh, s2.nsh
           HAVING count(*) * 1.0 / (s1.nsh + s2.nsh - count(*)) >= 0.5
           UNION ALL
           SELECT b.doc_id
           FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
           JOIN (SELECT doc_id, count(*) AS nsh FROM sh GROUP BY 1) s1
             ON a.doc_id = s1.doc_id
           JOIN (SELECT doc_id, count(*) AS nsh FROM sh GROUP BY 1) s2
             ON b.doc_id = s2.doc_id
           GROUP BY a.doc_id, b.doc_id, s1.nsh, s2.nsh
           HAVING count(*) * 1.0 / (s1.nsh + s2.nsh - count(*)) >= 0.5)),
         t AS (SELECT source, lang, text, $Toks AS ts FROM documents),
         q AS (SELECT source, lang, len(ts) AS ntok,
             floor(least(length(text) / 500.0, 1.0) * greatest(0.0,
               1.0 - (CASE WHEN len(ts) = 0 THEN 0.0 ELSE
                 len(list_filter(ts, x -> x IN ('the','a','an','of','and',
                   'to','in','is','on','for','with'))) * 1.0 / len(ts) END)
                 * 2.0) * 1e6 + 0.5) / 1e6 AS qual
           FROM t)
         SELECT count(*) AS n_docs,
           CAST(sum(ntok) AS BIGINT) AS n_tokens,
           count(DISTINCT lang) AS n_langs,
           count(DISTINCT source) AS n_sources,
           floor((avg(qual) + 0.123456789) * 1e6 + 0.5) / 1e6 AS mean_quality,
           (SELECT CAST(count(*) AS BIGINT) FROM dup) AS n_dup_docs,
           floor((SELECT count(*) FROM dup) * 1.0 / count(*)
             * 1e6 + 0.5) / 1e6 AS dup_rate6
         FROM q""",
    // p21: the p11 md5-long spelling mod k; shares divide exact counts.
    "p21_kfold" ->
      """WITH f AS (SELECT doc_id, source,
           CAST(concat('0x', substr(md5('fold' ||
             CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 5 AS fold
         FROM documents),
         t AS (SELECT CAST(count(*) AS BIGINT) AS total FROM documents)
         SELECT fold, source, count(*) AS n_docs,
           floor(CAST(count(*) AS DOUBLE) / total * 1e6 + 0.5) / 1e6
             AS share6
         FROM f, t GROUP BY fold, source, total ORDER BY fold, source""",
    // p20: md5 over the identical amended text on both engines.
    "p20_snapshot_diff" ->
      """WITH b AS (SELECT doc_id, md5(text) AS h FROM documents
           WHERE doc_id % 10 <> 7),
         a AS (SELECT doc_id,
             md5(CASE WHEN doc_id % 10 = 5 THEN text || ' amended'
               ELSE text END) AS h
           FROM documents WHERE doc_id % 10 <> 3)
         SELECT COALESCE(b.doc_id, a.doc_id) AS doc_id,
           CASE WHEN b.h IS NULL THEN 'added'
                WHEN a.h IS NULL THEN 'removed'
                WHEN b.h = a.h THEN 'unchanged'
                ELSE 'changed' END AS status
         FROM b FULL OUTER JOIN a ON b.doc_id = a.doc_id
         ORDER BY doc_id""",
    // p24: anti-join + union replayed relationally; md5 over the
    // identical amended/new text on both engines.
    "p24_upsert" ->
      """WITH upd AS (
           SELECT doc_id, source, text || ' amended' AS text
           FROM documents WHERE doc_id % 10 = 5
           UNION ALL
           SELECT * FROM (VALUES
             (CAST(-1 AS BIGINT), 'recrawl', 'fresh doc one'),
             (CAST(-2 AS BIGINT), 'recrawl', 'fresh doc two'),
             (CAST(-3 AS BIGINT), 'recrawl', 'fresh doc three'))
             t(doc_id, source, text))
         SELECT doc_id, source, md5(text) AS fp FROM (
           SELECT doc_id, source, text FROM documents
           WHERE doc_id NOT IN (SELECT doc_id FROM upd)
           UNION ALL SELECT doc_id, source, text FROM upd)
         ORDER BY doc_id""",
    // p25: the same anti-join + union with tombstones filtered out.
    "p25_apply_cdc" ->
      """WITH chg AS (
           SELECT doc_id, source, text || ' amended' AS text, 'U' AS op
           FROM documents WHERE doc_id % 10 = 5
           UNION ALL
           SELECT doc_id, source, text, 'D' AS op
           FROM documents WHERE doc_id % 10 = 7
           UNION ALL
           SELECT * FROM (VALUES
             (CAST(-1 AS BIGINT), 'cdc', 'fresh doc one', 'U'),
             (CAST(-2 AS BIGINT), 'cdc', 'fresh doc two', 'U'))
             t(doc_id, source, text, op))
         SELECT doc_id, source, md5(text) AS fp FROM (
           SELECT doc_id, source, text FROM documents
           WHERE doc_id NOT IN (SELECT doc_id FROM chg)
           UNION ALL
           SELECT doc_id, source, text FROM chg WHERE op <> 'D')
         ORDER BY doc_id""",
    // p26: last-writer-wins replayed as a rank window over the same
    // multi-op log (a deliberately different spelling than the engine's
    // max_by aggregation), then p25's anti-join + filtered union.
    // p29 (the streaming twin) answers the identical question and
    // re-registers this SQL VERBATIM — the e57 shared-oracle doctrine.
    "p26_cdc_compact" -> CdcCompactSql,
    "p29_stream_cdc" -> CdcCompactSql,
    // p35: the three stages' oracle CTE families composed in ONE
    // statement — clf training (TextQueries.clfCtes, w8 + feats over
    // the ORIGINAL corpus), the ExactSubstr clean
    // (DedupQueries.ExactSubstr50Ctes), and the t33 routing CASE; the
    // name families are disjoint by construction.
    "p35_curation_v2" -> {
      val script = TextQueries.scriptCaseSql("text")
      s"""WITH ${TextQueries.clfCtes(16, 8)},
         ${DedupQueries.ExactSubstr50Ctes},
         zf AS (SELECT doc_id, sum(x * w) AS z
           FROM feats JOIN w8 USING (feat) GROUP BY 1),
         clean AS (SELECT t.doc_id, CAST(len(ts) AS BIGINT) AS n_tokens,
             CAST(COALESCE(outp.kept, 0) AS BIGINT) AS kept,
             COALESCE(outp.clean_text, '') AS clean_text
           FROM t LEFT JOIN outp USING (doc_id)),
         rt AS (SELECT doc_id, COALESCE(script,
             CASE WHEN en + es + de + fr = 0 THEN 'und'
               ELSE ${TextQueries.LatinCaseSql} END) AS route
           FROM (SELECT doc_id, $script AS script,
               ${TextQueries.MarkerColsSql}
             FROM (SELECT doc_id, text, $Toks AS ts FROM documents)))
         SELECT c.doc_id, rt.route, c.n_tokens, c.kept,
           md5(c.clean_text) AS fp
         FROM clean c JOIN zf USING (doc_id) JOIN rt USING (doc_id)
         WHERE zf.z >= 0 AND c.kept >= 10 AND rt.route <> 'und'
         ORDER BY c.doc_id"""
    },

    // p34: version 4 = the full log's `applied` (p32's answer, one
    // version later); version 3 = the PREFIX replay — the same rank
    // window and anti-join close over only the rows the first two
    // epochs delivered (seqs 3 and 1).
    "p34_stream_cdc_commit" ->
      s"""WITH $CdcLogCtes,
         lwp AS (SELECT doc_id, source, text, op FROM (
             SELECT *, row_number() OVER (PARTITION BY doc_id
               ORDER BY seq DESC) AS rk FROM chg WHERE seq IN (1, 3))
           WHERE rk = 1),
         appliedp AS (
           SELECT doc_id, source, text FROM documents
           WHERE doc_id NOT IN (SELECT doc_id FROM lwp)
           UNION ALL
           SELECT doc_id, source, text FROM lwp WHERE op <> 'D')
         SELECT version, doc_id, source, fp FROM (
           SELECT 3 AS version, doc_id, source, md5(text) AS fp
           FROM appliedp
           UNION ALL
           SELECT 4, doc_id, source, md5(text) FROM applied)
         ORDER BY version, doc_id""",
    // p27: version 1 is the untouched snapshot, version 2 is p24's
    // upsert — the time-travel contract expressed directly.
    "p27_time_travel" -> TimeTravelSql,
    // p36: the change-feed reconstruction must equal time travel
    // snapshot for snapshot — p27's oracle re-registered VERBATIM.
    "p36_table_change_feed" -> TimeTravelSql,
    // p40: time travel to v3 (v2's upsert then the %10==2 amendment)
    // with the exactly-once-across-restart delivery audit pinned.
    "p40_feed_restart" ->
      """WITH upd2 AS (
           SELECT doc_id, source, text || ' amended' AS text
           FROM documents WHERE doc_id % 10 = 5
           UNION ALL
           SELECT * FROM (VALUES
             (CAST(-1 AS BIGINT), 'recrawl', 'fresh doc one'),
             (CAST(-2 AS BIGINT), 'recrawl', 'fresh doc two'),
             (CAST(-3 AS BIGINT), 'recrawl', 'fresh doc three'))
             t(doc_id, source, text)),
         v2 AS (
           SELECT doc_id, source, text FROM documents
           WHERE doc_id NOT IN (SELECT doc_id FROM upd2)
           UNION ALL SELECT doc_id, source, text FROM upd2),
         upd3 AS (
           SELECT doc_id, source, text || ' amended again' AS text
           FROM documents WHERE doc_id % 10 = 2),
         v3 AS (
           SELECT doc_id, source, text FROM v2
           WHERE doc_id NOT IN (SELECT doc_id FROM upd3)
           UNION ALL SELECT doc_id, source, text FROM upd3)
         SELECT 'a1,a2,b3' AS delivered, doc_id, source, md5(text) AS fp
         FROM v3 ORDER BY doc_id""",
    // p39: the maintained view must equal the batch GROUP BY over the
    // upserted table — the same v2 construction as p27's oracle.
    "p39_feed_ivm" ->
      """WITH upd AS (
           SELECT doc_id, source, text || ' amended' AS text
           FROM documents WHERE doc_id % 10 = 5
           UNION ALL
           SELECT * FROM (VALUES
             (CAST(-1 AS BIGINT), 'recrawl', 'fresh doc one'),
             (CAST(-2 AS BIGINT), 'recrawl', 'fresh doc two'),
             (CAST(-3 AS BIGINT), 'recrawl', 'fresh doc three'))
             t(doc_id, source, text)),
         v2 AS (
           SELECT doc_id, source, text FROM documents
           WHERE doc_id NOT IN (SELECT doc_id FROM upd)
           UNION ALL SELECT doc_id, source, text FROM upd)
         SELECT source, CAST(count(*) AS BIGINT) AS n_docs
         FROM v2 GROUP BY source ORDER BY source""",
    // p38: as-of 1500 resolves v1, as-of 2500 resolves v2 — the
    // time-travel contract by wall clock; p27's oracle VERBATIM.
    "p38_version_as_of" -> TimeTravelSql,
    // p37: the clause matrix expressed directly — matched rows split by
    // the DELETE marker then the longer-text update condition;
    // base-only rows survive unless the %10==9 purge fires; source-only
    // rows insert only from 'recrawl'.
    "p37_merge_matrix" ->
      """WITH src AS (
           SELECT doc_id, source, text || ' amended longer text' AS text
           FROM documents WHERE doc_id % 10 = 5
           UNION ALL
           SELECT doc_id, source, substr(text, 1, 5) FROM documents
           WHERE doc_id % 10 = 3
           UNION ALL
           SELECT doc_id, source, 'DELETE' FROM documents
           WHERE doc_id % 10 = 7
           UNION ALL
           SELECT * FROM (VALUES
             (CAST(-1 AS BIGINT), 'recrawl', 'fresh doc one'),
             (CAST(-2 AS BIGINT), 'staging', 'skip me'))
             t(doc_id, source, text)),
         merged AS (
           SELECT d.doc_id,
             CASE WHEN length(s.text) > length(d.text)
               THEN s.source ELSE d.source END AS source,
             CASE WHEN length(s.text) > length(d.text)
               THEN s.text ELSE d.text END AS text
           FROM documents d JOIN src s USING (doc_id)
           WHERE s.text <> 'DELETE'
           UNION ALL
           SELECT doc_id, source, text FROM documents
           WHERE doc_id NOT IN (SELECT doc_id FROM src)
             AND doc_id % 10 <> 9
           UNION ALL
           SELECT doc_id, source, text FROM src
           WHERE doc_id NOT IN (SELECT doc_id FROM documents)
             AND source = 'recrawl')
         SELECT doc_id, source, md5(text) AS fp FROM merged
         ORDER BY doc_id""",
    // p28: the expected statuses follow directly from the commit
    // construction — %10==5 changed at v2, %10==3 changed at v3,
    // inserts added, everything else unchanged (no removals: upserts
    // never delete).
    "p28_version_diff" ->
      """SELECT pair, doc_id, status FROM (
           SELECT 'v1v2' AS pair, doc_id,
             CASE WHEN doc_id % 10 = 5 THEN 'changed'
               ELSE 'unchanged' END AS status
           FROM documents
           UNION ALL
           SELECT 'v1v2', doc_id, 'added' FROM (VALUES
             (CAST(-1 AS BIGINT)), (CAST(-2 AS BIGINT)),
             (CAST(-3 AS BIGINT))) t(doc_id)
           UNION ALL
           SELECT 'v1v3' AS pair, doc_id,
             CASE WHEN doc_id % 10 = 5 OR doc_id % 10 = 3 THEN 'changed'
               ELSE 'unchanged' END AS status
           FROM documents
           UNION ALL
           SELECT 'v1v3', doc_id, 'added' FROM (VALUES
             (CAST(-1 AS BIGINT)), (CAST(-2 AS BIGINT)),
             (CAST(-3 AS BIGINT)), (CAST(-4 AS BIGINT))) t(doc_id))
         ORDER BY pair, doc_id""",
    // p30: the two SURVIVING versions after the vacuum — v2 (amend
    // %10==5 + 3 inserts) and v3 (further amend %10==3 + 1 insert).
    "p30_vacuum" ->
      """WITH upd2 AS (
           SELECT doc_id, source, text || ' amended5' AS text
           FROM documents WHERE doc_id % 10 = 5
           UNION ALL
           SELECT * FROM (VALUES
             (CAST(-1 AS BIGINT), 'recrawl', 'fresh doc one'),
             (CAST(-2 AS BIGINT), 'recrawl', 'fresh doc two'),
             (CAST(-3 AS BIGINT), 'recrawl', 'fresh doc three'))
             t(doc_id, source, text)),
         v2 AS (
           SELECT doc_id, source, text FROM documents
           WHERE doc_id NOT IN (SELECT doc_id FROM upd2)
           UNION ALL SELECT doc_id, source, text FROM upd2),
         upd3 AS (
           SELECT doc_id, source, text || ' amended3' AS text
           FROM documents WHERE doc_id % 10 = 3
           UNION ALL
           SELECT * FROM (VALUES
             (CAST(-4 AS BIGINT), 'recrawl', 'fresh doc four'))
             t(doc_id, source, text)),
         v3 AS (
           SELECT doc_id, source, text FROM v2
           WHERE doc_id NOT IN (SELECT doc_id FROM upd3)
           UNION ALL SELECT doc_id, source, text FROM upd3)
         SELECT version, doc_id, source, fp FROM (
           SELECT 2 AS version, doc_id, source, md5(text) AS fp FROM v2
           UNION ALL
           SELECT 3, doc_id, source, md5(text) FROM v3)
         ORDER BY version, doc_id""",
    // p32: version 1 is the untouched snapshot; version 2 is the
    // compacted log applied — the `applied` CTE p26/p29 already close
    // on, labeled and stacked.
    "p32_cdc_commit" ->
      s"""WITH $CdcLogCtes
         SELECT version, doc_id, source, fp FROM (
           SELECT 1 AS version, doc_id, source, md5(text) AS fp
           FROM documents
           UNION ALL
           SELECT 2, doc_id, source, md5(text) FROM applied)
         ORDER BY version, doc_id""",
    // p33: updated rows carry the evolved column's value (length of
    // the amended text), every other row surfaces NULL through the
    // mergeSchema read.
    "p33_schema_evolution" ->
      """SELECT doc_id, fp, quality FROM (
           SELECT doc_id, md5(text) AS fp,
             CAST(NULL AS BIGINT) AS quality
           FROM documents WHERE doc_id % 10 <> 5
           UNION ALL
           SELECT doc_id, md5(text || ' amended'),
             CAST(length(text || ' amended') AS BIGINT)
           FROM documents WHERE doc_id % 10 = 5)
         ORDER BY doc_id""",
    // p31: the non-unchanged rows of the v1→v3 diff, straight from the
    // commit construction (%10 ∈ {3,5} changed, the four inserts added,
    // nothing removed — upserts never delete).
    "p31_incremental_read" ->
      """SELECT doc_id, status FROM (
           SELECT doc_id, 'changed' AS status FROM documents
           WHERE doc_id % 10 IN (3, 5)
           UNION ALL
           SELECT doc_id, 'added' FROM (VALUES
             (CAST(-1 AS BIGINT)), (CAST(-2 AS BIGINT)),
             (CAST(-3 AS BIGINT)), (CAST(-4 AS BIGINT))) t(doc_id))
         ORDER BY doc_id"""
  )
}
