package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Dataset-assembly operators for training pipelines: deterministic
  * splits and token-budget shard packing.
  *
  * Both are pure shuffle-light column logic — a split is one md5 per row
  * (no shuffle at all), packing is the two-pass distributed prefix sum —
  * so they compose onto the end of any cleaning pipeline without adding
  * a scan.
  */
object PipelineOps {

  /** Deterministic train/val/test assignment by content-free id hashing:
    * the first 4 hex chars of `md5(id)` partition [0, 16^4) and cumulative
    * fraction thresholds map lexicographic ranges to split names. Properties
    * that matter in production:
    *  - deterministic and engine-portable (md5 of the decimal id string —
    *    no engine-specific hash), so the assignment survives re-runs,
    *    backfills, and engine migrations;
    *  - per-row, no shuffle, no sampling pass;
    *  - stable under corpus growth (a doc's split never depends on other
    *    rows).
    * Threshold granularity is 1/65536 — fractions are rounded to that grid.
    * `salt` reshuffles assignment without touching ids (e.g. per-epoch
    * held-out rotation). */
  def hashSplit(df: DataFrame, idCol: String,
                splits: Seq[(String, Double)],
                salt: String = ""): DataFrame = {
    require(splits.nonEmpty && math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      "split fractions must sum to 1")
    val h = substring(md5(concat(lit(salt), col(idCol).cast("string"))), 1, 4)
    val cums = splits.scanLeft(0.0) { case (acc, (_, f)) => acc + f }.tail
    // lexicographic compare of fixed-width lowercase hex == numeric compare
    val thresholds = cums.map(f => f"${math.min((f * 65536).toLong, 65535L)}%04x")
    val assigned = splits.map(_._1).zip(thresholds)
      .foldLeft(lit(null).cast("string")) { case (acc, (nm, th)) =>
        coalesce(acc, when(h < lit(th), lit(nm)))
      }
    // last bucket takes the h == ffff edge row
    df.withColumn("split", coalesce(assigned, lit(splits.last._1)))
  }

  /** First 4 hex chars of md5(salt || id): a uniform, deterministic,
    * engine-portable draw in [0, 16^4) that compares lexicographically ==
    * numerically (fixed-width lowercase hex). Distinct decisions on the
    * same ids (split vs mixture vs sampling) MUST use distinct salts, or
    * they correlate — e.g. the mixture would preferentially drop one
    * split's rows. */
  private def hex4(id: Column, salt: String): Column =
    substring(md5(concat(lit(salt), id.cast("string"))), 1, 4)

  private def hexThreshold(rate: Double): String =
    f"${math.min((rate * 65536).toLong, 65535L)}%04x"

  /** Temperature-balanced source mixture at α = 0.5: per-source target
    * weights ∝ √n_source — the classic multilingual/domain rebalance
    * (upsample the tail, downsample the head) that fixed-rate
    * [[mixtureSample]] can't express because here the rates derive FROM
    * the corpus. Each source keeps `min(1, target/n)` of its rows by the
    * same salted md5 draw as p04, where `target = budget · √n/Σ√n`.
    *
    * Determinism: √n is IEEE-correctly-rounded in every engine
    * (sqrt is an exact-rounded op, unlike ln/pow — that's WHY α is
    * pinned at 0.5), snapped to micro-unit longs before the order-free
    * sum; shares/targets/thresholds are single fixed-association
    * expressions of those exact integers. The keep predicate compares
    * fixed-width lowercase hex, with rate ≥ 1 short-circuited (a 5-hex
    * '10000' threshold would break the lexicographic compare).
    *
    * Scale shape: one k-sources count aggregate + a broadcast plan join;
    * the corpus itself is never shuffled. */
  def temperatureMixture(df: DataFrame, idCol: String, srcCol: String,
                         budget: Long, salt: String = "tmix"): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = graft.Caches.track(
      df.groupBy(col(srcCol).as("src")).agg(count(lit(1)).as("n"))
        .withColumn("wu",
          floor(sqrt(col("n").cast("double")) * 1e6 + 0.5).cast("long"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val sumW = w.agg(sum(col("wu"))).head().getLong(0) // 1-row, k sources
    require(sumW > 0, "temperatureMixture needs rows")
    val plan = w.select(col("src"), col("n"),
      graft.ops.TextOps.round6(col("wu").cast("double")
        / lit(sumW.toDouble)).as("share6"),
      floor(col("wu").cast("double") / lit(sumW.toDouble)
        * lit(budget.toDouble)).cast("long").as("target"))
      .withColumn("thresh", when(col("target") >= col("n"), lit(65536L))
        .otherwise(floor(col("target").cast("double")
          / col("n").cast("double") * lit(65536.0)).cast("long")))
    df.join(broadcast(plan), col(srcCol) === col("src"))
      .filter(col("thresh") === 65536L ||
        hex4(col(idCol), salt) <
          lower(lpad(hex(col("thresh")), 4, "0")))
      .drop("src", "n", "thresh")
  }

  /** Deterministic stratified sample: the `k` rows of each stratum with
    * the smallest md5 draw (ties broken by id). One shuffle keyed by the
    * stratum; rank is a per-stratum window, so a single giant stratum
    * means a single sort task — for that regime pre-filter with
    * [[mixtureSample]] at a few × k/|stratum| to cut each stratum to
    * roughly k before ranking. */
  def stratifiedTopK(df: DataFrame, idCol: String, strataCol: String,
                     k: Int, salt: String = "strat"): DataFrame = {
    require(k > 0, "k must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol))
      .orderBy(hex4(col(idCol), salt), col(idCol))
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k).drop("__rk")
  }

  /** Per-stratum Bernoulli sampling at deterministic, engine-portable
    * rates — the domain-mixture reweighting step of corpus assembly
    * ("keep 100% of wiki, 25% of crawl"). Pure per-row predicate: no
    * shuffle, no sampling pass, stable under corpus growth; re-running
    * with the same salt reproduces the exact row set. Rates ≥ 1 keep the
    * whole stratum (including the 'ffff' edge draw); strata missing from
    * `rates` fall back to `defaultRate`. */
  def mixtureSample(df: DataFrame, idCol: String, strataCol: String,
                    rates: Map[String, Double], defaultRate: Double,
                    salt: String = "mix"): DataFrame =
    df.filter(keepExpr(idCol, strataCol, rates, defaultRate, salt))

  /** The mixture-keep predicate itself ([[mixtureSample]]'s body;
    * [[epochSchedule]] evaluates it once per epoch on one scan). */
  private def keepExpr(idCol: String, strataCol: String,
                       rates: Map[String, Double], defaultRate: Double,
                       salt: String): Column = {
    val h = hex4(col(idCol), salt)
    def keep(r: Double): Column =
      if (r >= 1.0) lit(true) else h < lit(hexThreshold(r))
    rates.foldLeft(keep(defaultRate)) { case (acc, (s, r)) =>
      when(col(strataCol) === s, keep(r)).otherwise(acc)
    }
  }

  /** Multi-epoch replay schedule: epoch `e` keeps
    * `mixtureSample(salt = salt+e)` — the salted-rotation trick that
    * gives every epoch a fresh deterministic subset at the same mixture
    * rates, with no stored state and no shuffle of the corpus. ONE scan:
    * each row evaluates all `epochs` keep predicates (E md5s), the
    * (epoch, keep) pairs explode, and one partial+final aggregation
    * yields the per-(epoch, stratum) kept counts a training scheduler
    * consumes. */
  def epochSchedule(df: DataFrame, idCol: String, strataCol: String,
                    rates: Map[String, Double], defaultRate: Double,
                    epochs: Int, salt: String = "ep"): DataFrame = {
    require(epochs >= 1, "epochs must be >= 1")
    val inds = (0 until epochs).map(e => struct(lit(e).as("epoch"),
      keepExpr(idCol, strataCol, rates, defaultRate, s"$salt$e").as("keep")))
    df.select(col(strataCol).as("stratum"),
        explode(array(inds: _*)).as("x"))
      .filter(col("x.keep"))
      .groupBy(col("x.epoch").as("epoch"), col("stratum"))
      .agg(count(lit(1)).as("n_docs"))
  }

  /** Token-budget shard packing (the "concatenate and chunk every `budget`
    * tokens" layout LLM pre-training uses): rows ordered by `idCol` get a
    * shard number `floor(start_offset / budget)` where `start_offset` is
    * the exclusive prefix sum of `tokenCol`. A doc that straddles a
    * boundary belongs to the shard it starts in.
    *
    * Scale shape: the prefix sum is the two-pass distributed form (equal
    * -width id-range buckets → per-bucket window + bounded bucket-total
    * offsets rejoined as a literal map) — same machinery as
    * `Series.cumsumDistributed`, no single-task global window. */
  def packShards(df: DataFrame, idCol: String, tokenCol: String,
                 budget: Long, buckets: Int = 32): DataFrame = {
    require(budget > 0, "budget must be positive")
    val bounds = df.agg(min(col(idCol)).cast("double"),
      max(col(idCol)).cast("double")).head()
    if (bounds.isNullAt(0)) return df.withColumn("shard", lit(0L))
    val lo = bounds.getDouble(0)
    val span = bounds.getDouble(1) - lo
    val bkt =
      if (span <= 0.0) lit(0L)
      else least(floor((col(idCol).cast("double") - lit(lo)) / lit(span / buckets)),
        lit(buckets - 1.0)).cast("long")
    val keyed = graft.Caches.track(df.withColumn("__bkt", bkt)
      .persist(StorageLevel.MEMORY_AND_DISK))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__bkt")).orderBy(col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    // bounded driver state: exactly `buckets` totals, accumulated in order
    val totals = keyed.groupBy(col("__bkt"))
      .agg(sum(col(tokenCol)).cast("long").as("__t"))
      .orderBy(col("__bkt")).collect().filterNot(_.isNullAt(0))
    var acc = 0L
    val offsets = totals.map { r =>
      val o = acc; if (!r.isNullAt(1)) acc += r.getLong(1); r.getLong(0) -> o
    }.toMap
    keyed
      .withColumn("__start",
        coalesce(element_at(typedlit(offsets), col("__bkt")), lit(0L)) +
          coalesce(sum(col(tokenCol).cast("long")).over(w), lit(0L)))
      .withColumn("shard", floor(col("__start") / lit(budget)).cast("long"))
      .drop("__bkt", "__start")
  }

  /** Additive corpus datasheet: one row per (source, lang) of PURE
    * COUNTERS (doc count, token total, µ-unit quality sum) — every field
    * survives a groupBy+sum, so per-shard reports roll up into the
    * corpus report WITHOUT re-reading a single document
    * ([[mergeReports]]; the d27 KMV mergeability story for the
    * datasheet). One partial+final aggregate; output is
    * |sources|×|langs|-bounded. */
  def corpusReport(df: DataFrame): DataFrame =
    df.groupBy(col("source"), col("lang")).agg(
      count(lit(1)).as("n_docs"),
      sum(graft.ops.TextOps.tokenCount(col("text")).cast("long"))
        .as("n_tokens"),
      sum(floor(graft.ops.TextOps.qualityScore(col("text")) * lit(1e6)
        + lit(0.5)).cast("long")).as("qual_u"))

  /** Merge shard-level [[corpusReport]]s: union + one keyed sum — the
    * counters are additive BY CONSTRUCTION, so the merged report equals
    * the report over the concatenated corpora exactly (p15 proves it
    * against the full-data oracle). */
  def mergeReports(reports: DataFrame*): DataFrame =
    reports.reduce(_.unionByName(_))
      .groupBy("source", "lang")
      .agg(sum(col("n_docs")).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(col("qual_u")).as("qual_u"))

  /** Roll a (source, lang) counter report up to the per-source
    * datasheet: totals, exact-ratio mean quality (µ-unit sum / count —
    * deterministic where a float avg would carry association drift),
    * and the language count (one row per (source, lang) by
    * construction). */
  def reportSummary(report: DataFrame): DataFrame =
    report.groupBy("source").agg(
        sum(col("n_docs")).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        graft.ops.TextOps.round6(
          (sum(col("qual_u")).cast("double") / lit(1e6))
            / sum(col("n_docs")).cast("double")).as("mean_quality"),
        count(lit(1)).as("n_langs"))

  /** Content-addressed shard manifest — the integrity artifact a corpus
    * publisher ships next to its shards: per shard, the doc count, token
    * total, id range, and an ORDER-FREE content checksum (Σ of per-doc
    * portable 60-bit md5 hashes folded mod the Mersenne prime 2³¹−1 —
    * commutative, so any write order / partitioning of the shard
    * reproduces it; a consumer re-derives and diffs to catch drops,
    * dupes, or silent corruption). Composes [[packShards]]'s distributed
    * prefix-sum assignment with ONE partial+final aggregate keyed by
    * shard. The mod-2³¹ fold keeps the running sum inside BIGINT for up
    * to 2³² docs per shard (shards are budget-bounded far below that). */
  def shardManifest(df: DataFrame, idCol: String, tokenCol: String,
                    contentCol: String, budget: Long): DataFrame = {
    val P = 2147483647L // Mersenne 2³¹−1
    packShards(df, idCol, tokenCol, budget)
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(tokenCol).cast("long")).as("total_tokens"),
        min(col(idCol)).as("first_id"), max(col(idCol)).as("last_id"),
        sum(pmod(graft.ops.DedupOps.portableHash60(col(contentCol)),
          lit(P))).as("__s"))
      .withColumn("checksum", pmod(col("__s"), lit(P)))
      .drop("__s")
  }

  /** Greedy token-budget SEQUENCE packing — the padding-free "example
    * packing" layout (GPT-style pre-training batches): each doc stays
    * ATOMIC, docs fill the current training sequence in order, and a new
    * sequence opens when the next doc would overflow `budget`. The
    * concatenate-and-chunk sibling (docs may straddle) is [[packShards]].
    * A doc longer than the budget occupies a sequence of its own.
    *
    * Scale shape: greedy packing is inherently sequential, so the corpus
    * is salted-md5-sharded into `shards` INDEPENDENT pack streams (the
    * unit a writer task owns); each shard packs its docs in `idCol` order
    * through an O(1)-state fold. One keyed exchange (repartition by shard
    * + sortWithinPartitions), then a single partition-local pass — no
    * global order, no driver state, shard count sized to writer
    * parallelism. Output: (id, shard, seq_id, seq_pos) where seq_pos is
    * the doc's token offset inside its sequence. */
  def packSequences(df: DataFrame, idCol: String, tokenCol: Column,
                    budget: Long, shards: Int,
                    salt: String = "pack"): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(shards >= 1, "shards must be >= 1")
    import org.apache.spark.sql.{Encoder, Encoders}
    implicit val inEnc: Encoder[(Long, Long, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
        Encoders.scalaLong)
    implicit val outEnc: Encoder[(Long, Long, Long, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
        Encoders.scalaLong, Encoders.scalaLong)
    val shard = pmod(graft.ops.DedupOps.portableHash60(
      concat(lit(salt), col(idCol).cast("string"))), lit(shards.toLong))
    df.select(shard.as("__shard"), col(idCol).cast("long").as("__id"),
        tokenCol.cast("long").as("__tok"))
      .as[(Long, Long, Long)]
      .repartition(col("__shard"))
      .sortWithinPartitions(col("__shard"), col("__id"))
      .mapPartitions { it =>
        // co-partitioned shards stream through in (shard, id) order; the
        // fold resets at each shard boundary — O(1) state per task.
        var cur = -1L; var seq = 0L; var cum = 0L
        it.map { case (sh, id, tok) =>
          if (sh != cur) { cur = sh; seq = 0L; cum = 0L }
          if (cum > 0 && cum + tok > budget) { seq += 1; cum = 0L }
          val pos = cum
          cum += tok
          (id, sh, seq, pos)
        }
      }
      .toDF(idCol, "shard", "seq_id", "seq_pos")
  }

  /** Curriculum manifest — the stage/shard layout a quality-ordered
    * training run reads: each doc gets a STAGE from explicit
    * quality-score band edges (declared up front, the 100 TB rule — no
    * global quantile job over the corpus) and a deterministic md5 SHARD
    * slot within its stage; the output is one row per (stage, shard)
    * with doc count and token sum. Stage k means quality ∈ [edges(k−1),
    * edges(k)) with stage 0 below the first edge — training replays
    * stages in ascending order. Pure per-row projection + ONE
    * partial+final aggregation; re-runs, backfills, and engine
    * migrations reproduce the identical layout (md5 of the decimal id,
    * no engine-specific hash). */
  def curriculumManifest(df: DataFrame, idCol: String, scoreCol: Column,
                         tokenCol: Column, edges: Seq[Double], shards: Int,
                         salt: String = "curr"): DataFrame = {
    require(edges.nonEmpty && edges == edges.sorted,
      "stage edges must be non-empty and ascending")
    require(shards > 0, "shards must be positive")
    // stage = how many edges the score clears (sum of indicators — the
    // same spelling the oracle uses, no nested CASE ordering to mirror).
    // Pass a GRID-SNAPPED score (e.g. TextOps.round6 of a quality model)
    // if the score is engine-replicated: raw 1-ulp drift at an edge would
    // flip the stage.
    val stage = edges.map(e => when(scoreCol >= lit(e), 1).otherwise(0))
      .reduce(_ + _)
    val shard = pmod(DedupOps.portableHash60(
      concat(lit(salt), col(idCol).cast("string"))), lit(shards.toLong))
    df.select(stage.as("stage"), shard.as("shard"),
        tokenCol.cast("long").as("__tok"))
      .groupBy("stage", "shard")
      .agg(count(lit(1)).as("n_docs"), sum("__tok").as("n_tokens"))
  }

  /** Corpus length histogram — the datasheet's length distribution: doc
    * count and token mass per power-of-2 token-count bucket. The bucket
    * is an indicator SUM over declared edges (n ≥ 2^k), not floor(log2):
    * log2 lands exactly ON integer values at powers of two, where a
    * 1-ulp engine difference flips the bucket — integer compares cannot
    * drift. Pure projection + ONE aggregation. */
  def lengthHistogram(df: DataFrame, tokenCol: Column,
                      maxPow: Int = 16): DataFrame = {
    require(maxPow >= 1 && maxPow <= 62, "maxPow must be in [1, 62]")
    val n = tokenCol.cast("long")
    val bucket = (1 to maxPow).map(k =>
      when(n >= lit(1L << k), 1).otherwise(0)).reduce(_ + _)
    df.select(bucket.as("bucket"), n.as("__n"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"), sum(col("__n")).as("n_tokens"))
  }

  /** Deterministic weighted sampling WITHOUT replacement (Efraimidis–
    * Spirakis A-ES): each row gets the key `−ln(u)/w` with `u` a salted
    * md5 uniform in (0, 1] — the `n` smallest keys are a weighted sample
    * without replacement (inclusion odds ∝ weight, exact ES). Properties
    * that matter at corpus scale:
    *  - one pass, NO shuffle of the corpus: `orderBy(key).limit(n)` plans
    *    as TakeOrderedAndProject — per-partition top-n heaps, the driver
    *    merges ≤ n·partitions candidate rows;
    *  - no RNG state: `u` is the 60-bit md5 integer of (salt, id) scaled
    *    to (0, 1] — deterministic, engine-portable (the d05 hash trick),
    *    re-runs and backfills pick the identical sample;
    *  - weights need not be normalized; non-positive weights are
    *    excluded (pandas sample(weights=) drops zero-weight rows). */
  def weightedSample(df: DataFrame, idCol: String, weight: Column,
                     n: Int, salt: String = ""): DataFrame = {
    require(n >= 1, "sample size must be >= 1")
    val h = conv(substring(
      md5(concat(lit(salt), col(idCol).cast("string"))), 1, 15), 16, 10)
      .cast("double")
    val u = (h + lit(1.0)) / lit(math.pow(2.0, 60))
    val key = -log(u) / weight.cast("double")
    df.where(weight.cast("double") > 0.0)
      .withColumn("__ws_key", key)
      .orderBy(col("__ws_key").asc)
      .limit(n)
      .drop("__ws_key")
  }

  /** Token-budget mixture: down-sample each stratum so the KEPT TOKEN
    * volume approaches `budget · share_s` (the unit training mixtures
    * are actually specified in — p04's row-rate sibling). Shares are
    * ABSOLUTE fractions of the budget (caller keeps Σ ≤ 1) — not
    * renormalized weights, so no cross-stratum float summation exists
    * anywhere and every rate derives from one literal and one exact
    * integer total. Per-stratum keep rate = min(1, target / available
    * tokens), applied as the same salted-md5 16-bit threshold as every
    * other pipeline draw (deterministic, reproducible, engine-portable;
    * rate granularity 1/65536). Two passes by design — one bounded
    * (|strata|-row) token-total probe, then the filtered scan — the
    * irreducible shape of any data-dependent sampling rate. Returns the
    * per-stratum report; the raw kept rows are [[tokenBudgetKept]]. */
  def tokenBudgetMixture(df: DataFrame, idCol: String, strataCol: String,
                         tokenCol: Column, shares: Map[String, Double],
                         defaultShare: Double, budget: Long,
                         salt: String = "tokmix"): DataFrame = {
    val kept = tokenBudgetKept(df, idCol, strataCol, tokenCol, shares,
      defaultShare, budget, salt)
    kept.groupBy(strataCol)
      .agg(count(lit(1)).as("n_kept"),
        sum(col("__tok")).as("kept_tokens"),
        first(col("__avail")).as("avail_tokens"),
        first(col("__target")).as("target_tokens"))
      .select(col(strataCol), col("avail_tokens"), col("target_tokens"),
        col("n_kept"), col("kept_tokens"))
  }

  /** [[tokenBudgetMixture]]'s kept rows, with the per-stratum bookkeeping
    * columns (`__tok`, `__avail`, `__target`) still attached. */
  private[graft] def tokenBudgetKept(df: DataFrame, idCol: String,
      strataCol: String, tokenCol: Column, shares: Map[String, Double],
      defaultShare: Double, budget: Long, salt: String): DataFrame = {
    require(budget > 0, "token budget must be positive")
    val totals = df.groupBy(strataCol).agg(sum(tokenCol).as("avail"))
      .collect() // |strata| rows — bounded driver state
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val h = hex4(col(idCol), salt)
    def shareOf(s: String) = shares.getOrElse(s, defaultShare)
    val keep = totals.foldLeft(lit(false)) { case (acc, (s, avail)) =>
      val target = budget * shareOf(s)
      val rate = if (avail <= 0) 0.0 else math.min(1.0, target / avail)
      val pred =
        if (rate >= 1.0) lit(true)
        else if (rate <= 0.0) lit(false)
        else h < lit(hexThreshold(rate))
      when(col(strataCol) === s, pred).otherwise(acc)
    }
    val targets = totals.keys.map { s =>
      s -> math.floor(budget * shareOf(s)).toLong
    }.toMap
    df.withColumn("__tok", tokenCol)
      .withColumn("__avail",
        totals.foldLeft(lit(null).cast("long")) { case (acc, (s, a)) =>
          when(col(strataCol) === s, lit(a)).otherwise(acc) })
      .withColumn("__target",
        targets.foldLeft(lit(null).cast("long")) { case (acc, (s, t)) =>
          when(col(strataCol) === s, lit(t)).otherwise(acc) })
      .filter(keep)
  }

  /** Per-group deterministic reservoir: exactly min(k, |group|) docs
    * per group, selected by md5-key rank — the balanced-eval-set /
    * per-source-spot-check sampler (uniform within group, reproducible,
    * engine-portable). One keyed exchange; the rank ≤ k predicate
    * executes as a WindowGroupLimit per-partition heap, so only k rows
    * per group survive the partial stage — never a full per-group
    * sort at the exchange. */
  def groupReservoir(df: DataFrame, groupCol: String, idCol: String,
                     k: Int, salt: String = "res"): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val key = md5(concat(lit(s"$salt:"), col(idCol).cast("string")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(key.asc, col(idCol).asc)
    df.select(col(groupCol), col(idCol), key.as("__k"))
      .withColumn("pick", row_number().over(w))
      .filter(col("pick") <= k)
      .select(col(groupCol), col("pick"), col(idCol))
  }

  /** Deterministic per-epoch GLOBAL shuffle manifest: each epoch
    * assigns every doc a position by ranking the salted md5 key
    * `md5("epoch<e>:" || id)` — the reproducible, engine-portable
    * "shuffle the corpus differently every epoch" a training loader
    * needs (same seed → same order on any cluster; distinct salts →
    * independent epoch permutations).
    *
    * Scale shape: per epoch the ranking runs the bucketed two-pass
    * GlobalWindows machinery over the md5-hex STRING coordinate (the
    * s52 plan — equal-width buckets on the first bytes, per-bucket
    * windows, broadcast exclusive offsets), NEVER a single-task or
    * per-epoch-partitioned global sort; epochs union. */
  def epochShuffle(df: DataFrame, idCol: String, epochs: Int): DataFrame = {
    require(epochs >= 1, "need at least one epoch")
    (0 until epochs).map { e =>
      val key = md5(concat(lit(s"epoch$e:"), col(idCol).cast("string")))
      val s = graft.core.Series.fromExpr(df, col(idCol), "doc", key, "k")
      val g = s.globalWindows()
      g.result("doc" -> col("doc"), "pos" -> g.position())
        .select(lit(e).as("epoch"), col("doc").as(idCol), col("pos"))
    }.reduce(_ unionByName _)
  }

  /** CONSTRUCTIVE decontaminated split — p13's audit turned into the
    * fix: [[hashSplit]] assigns train/val/test, then every TRAIN doc
    * whose n-gram containment against ANY eval doc reaches `tau` moves
    * to a `quarantine` bucket (dropped from training, never re-assigned
    * to eval — re-assignment would bias eval toward leak-prone docs).
    * Returns (id, split) for every doc — the split manifest a
    * train-job consumes.
    *
    * Scale shape: the split is a pure per-row md5 predicate; the
    * quarantine screen is [[graft.ops.DedupOps.ngramContamination]]
    * (hashed-gram postings equi-join, eval side broadcast) collapsed to
    * DISTINCT train ids + one left join back. The corpus is never
    * shuffled by n-gram. */
  def decontaminatedSplit(df: DataFrame, idCol: String, textCol: String,
                          splits: Seq[(String, Double)],
                          trainName: String, n: Int,
                          tau: Double): DataFrame = {
    val sp = graft.Caches.track(
      hashSplit(df.select(col(idCol), col(textCol)), idCol, splits)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val train = sp.filter(col("split") === trainName)
    val eval_ = sp.filter(col("split") =!= trainName)
    val quarantined = graft.ops.DedupOps
      .ngramContamination(train, eval_, idCol, textCol, n)
      .filter(col("containment") >= tau)
      .select(col("train_id").as(idCol)).distinct()
      .withColumn("__q", lit(1))
    sp.join(quarantined, Seq(idCol), "left")
      .select(col(idCol),
        when(col("split") === trainName && col("__q").isNotNull,
          lit("quarantine")).otherwise(col("split")).as("split"))
  }

  /** Deterministic k-fold assignment for cross-validation: fold =
    * portable 60-bit md5 of (salt ‖ id) mod k — engine-portable,
    * shuffle-free, leakage-free by id (every row of a document lands in
    * ONE fold forever, so no eval fold ever sees its train twin). The
    * CV sibling of [[hashSplit]]; distinct salts keep it independent of
    * any other md5 draw on the same ids. */
  def kfold(df: DataFrame, idCol: String, k: Int,
            salt: String = "fold"): DataFrame = {
    require(k >= 2, "k-fold needs k >= 2")
    df.withColumn("fold", pmod(graft.ops.DedupOps.portableHash60(
      concat(lit(salt), col(idCol).cast("string"))), lit(k.toLong)))
  }

  /** MERGE/upsert between a base snapshot and an update batch — the
    * lakehouse SCD-1 primitive ([[snapshotDiff]] tells you WHAT changed;
    * this APPLIES it): rows whose key appears in `updates` are replaced
    * by the update row, unmatched base rows survive, brand-new keys
    * insert. ONE key-anti-join + one union — the anti-join shuffles on
    * the key (or broadcasts when the update batch is small, the common
    * case), the base is never rewritten row-by-row; at 100 TB this is
    * the merge a copy-on-write table format runs per partition. Caller
    * contract: `updates` has at most one row per key (enforce upstream
    * — a multi-row update is order-ambiguous by definition). */
  def upsert(base: DataFrame, updates: DataFrame,
             keyCols: Seq[String]): DataFrame =
    base.join(updates.select(keyCols.map(col): _*), keyCols, "left_anti")
      .unionByName(updates)

  /** FULL conditional MERGE INTO — the complete Delta/Iceberg clause
    * matrix [[upsert]] (unconditional SCD-1) and [[applyCdc]] (op-coded)
    * are special cases of: WHEN MATCHED AND <cond> THEN DELETE / THEN
    * UPDATE (else keep the base row), WHEN NOT MATCHED AND <cond> THEN
    * INSERT (else drop the source row), and WHEN NOT MATCHED BY SOURCE
    * AND <cond> THEN DELETE (the retention purge of base rows the batch
    * no longer carries). Clause conditions receive the BASE and SOURCE
    * rows as structs (keys included) and may compare across them —
    * "update only if the recrawl is longer", "purge only stale
    * partitions". Matched precedence is delete, then update, then keep
    * (the Delta clause-order contract); a null condition counts false.
    *
    * Shape: ONE full-outer key join of (key, row-struct) projections,
    * one decision expression, one unwrap projection — no windows, no
    * driver state; at 100 TB this is a single keyed shuffle on both
    * sides (bucketed tables co-locate it). Caller contract: at most one
    * source row per key ([[compactCdc]] upstream), matching
    * [[applyCdc]]'s. Base and source must share a schema (use
    * [[upsertEvolve]] for widening batches). */
  def mergeInto(base: DataFrame, source: DataFrame, keyCols: Seq[String],
                matchedDeleteWhen: Option[(Column, Column) => Column] = None,
                matchedUpdateWhen: Option[(Column, Column) => Column] = None,
                insertWhen: Option[Column => Column] = None,
                notMatchedBySourceDeleteWhen: Option[Column => Column] = None)
      : DataFrame = {
    val cols = base.columns.toSeq
    def wrap(df: DataFrame, as: String): DataFrame =
      df.select(keyCols.map(col) :+ struct(cols.map(col): _*).as(as): _*)
    val j = wrap(base, "__b").join(wrap(source, "__s"), keyCols, "full_outer")
    val b = col("__b")
    val sc = col("__s")
    def cond(c: Option[Column]): Column =
      coalesce(c.getOrElse(lit(false)), lit(false))
    val del = cond(matchedDeleteWhen.map(f => f(b, sc)))
    val upd = cond(matchedUpdateWhen.map(f => f(b, sc)))
    val ins = cond(insertWhen.map(f => f(sc)))
    val nbs = cond(notMatchedBySourceDeleteWhen.map(f => f(b)))
    val nullRow = lit(null).cast(j.schema("__s").dataType)
    val picked = j.select(
      when(b.isNotNull && sc.isNotNull,
          when(del, nullRow).otherwise(when(upd, sc).otherwise(b)))
        .when(b.isNotNull, when(nbs, nullRow).otherwise(b))
        .otherwise(when(ins, sc).otherwise(nullRow))
        .as("__p"))
    picked.filter(col("__p").isNotNull)
      .select(cols.map(c => col("__p").getField(c).as(c)): _*)
  }

  /** [[upsert]] with SCHEMA EVOLUTION: the update batch may carry NEW
    * columns (and/or omit existing ones) — the union fills either
    * side's missing columns with null instead of failing, so a table
    * can gain a column mid-life without rewriting history (surviving
    * base rows take null for the new column — the lakehouse
    * add-column semantics). Same ONE anti-join + union shape. */
  def upsertEvolve(base: DataFrame, updates: DataFrame,
                   keyCols: Seq[String]): DataFrame =
    base.join(updates.select(keyCols.map(col): _*), keyCols, "left_anti")
      .unionByName(updates, allowMissingColumns = true)

  /** [[upsert]]'s CDC sibling: apply a change batch carrying an op
    * column ('U' upsert, 'D' delete) — the merge a CDC-fed table runs
    * per commit. Same shape: ONE key-anti-join drops every touched key
    * from the base, then the non-delete change rows re-insert. Caller
    * contract: at most one change row per key — [[compactCdc]] is the
    * last-writer-wins compactor that produces such a batch from a raw
    * multi-op CDC log. */
  def applyCdc(base: DataFrame, changes: DataFrame, keyCols: Seq[String],
               opCol: String): DataFrame =
    base.join(changes.select(keyCols.map(col): _*), keyCols, "left_anti")
      .unionByName(changes.filter(col(opCol) =!= "D").drop(opCol))

  /** Last-writer-wins CDC compaction — the missing half of
    * [[applyCdc]]'s caller contract: a real CDC stream delivers MANY
    * ops per key per window (insert, amend, delete, re-insert, out of
    * order), and the table merge needs exactly the LATEST one by the
    * log's sequence column. One `max_by` partial+final aggregation per
    * key: the winning row is the max of `(seq, payload…)` — a total
    * struct order, so even duplicate sequence numbers compact
    * deterministically (engine-portably) instead of silently emitting
    * duplicate key rows. Output: one row per key, `seqCol` dropped,
    * ready to feed [[applyCdc]] (or [[applyCdcLog]] does both).
    *
    * Scale shape: map-side partials collapse each partition to
    * ≤|keys| rows before the one keyed exchange — the change log is
    * never sorted and never windowed. */
  def compactCdc(changes: DataFrame, keyCols: Seq[String],
                 seqCol: String): DataFrame =
    compactCdcWithSeq(changes, keyCols, seqCol).drop(seqCol)

  /** [[compactCdc]] KEEPING the winning row's sequence number — the
    * STREAMING-state variant: a compacted state that retains (seq, op)
    * absorbs later micro-batches through another compaction round,
    * because last-writer-wins is ASSOCIATIVE — compact(compact(a) ∪ b)
    * == compact(a ∪ b) — so batch boundaries and arrival order never
    * change the result: a LATE row with a lower seq than the state's
    * winner loses to it, and tombstones retained in the state ('D'
    * rows are kept, not applied) stop a late lower-seq update from
    * resurrecting a deleted key. [[graft.streaming.StreamOps.cdcIngest]]
    * is the per-epoch loop. */
  def compactCdcWithSeq(changes: DataFrame, keyCols: Seq[String],
                        seqCol: String): DataFrame = {
    val payload = changes.columns
      .filterNot(c => keyCols.contains(c) || c == seqCol).toSeq
    val winner = max_by(struct(payload.map(col): _*),
      struct(col(seqCol) +: payload.map(col): _*))
    changes.groupBy(keyCols.map(col): _*)
      .agg(winner.as("__w"), max(col(seqCol)).as(seqCol))
      .select(keyCols.map(col) ++
        payload.map(c => col(s"__w.$c").as(c)) :+ col(seqCol): _*)
  }

  /** The composed CDC merge: [[compactCdc]] the raw multi-op log to
    * last-writer-wins rows, then [[applyCdc]] them — one aggregation +
    * one anti-join + one union, end to end. */
  def applyCdcLog(base: DataFrame, changes: DataFrame,
                  keyCols: Seq[String], opCol: String,
                  seqCol: String): DataFrame =
    applyCdc(base, compactCdc(changes, keyCols, seqCol), keyCols, opCol)

  /** Content-addressed diff between two corpus snapshots — the dataset
    * versioning primitive (what changed between crawl v1 and v2, and is
    * the delta small enough to ship as an incremental update?). Per doc
    * id: `added` (only in `after`), `removed` (only in `before`),
    * `changed` (content hash moved), `unchanged`. Comparing md5 hashes
    * rather than text keeps the join payload 16 bytes/doc regardless of
    * document size — at 100 TB the diff shuffles hashes, never bodies.
    * ONE id-keyed full-outer join; no corpus-global state. */
  def snapshotDiff(before: DataFrame, after: DataFrame, idCol: String,
                   textCol: String): DataFrame = {
    def hashed(df: DataFrame, as: String): DataFrame =
      df.select(col(idCol), md5(encode(col(textCol), "UTF-8")).as(as))
    hashed(before, "__ha").join(hashed(after, "__hb"),
        Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("__ha").isNull, "added")
          .when(col("__hb").isNull, "removed")
          .when(col("__ha") === col("__hb"), "unchanged")
          .otherwise("changed").as("status"))
  }
}
