package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is heavy-tailed.
  *
  * AQE's skew-join handling (on by default in Spark 4) splits oversized
  * shuffle partitions at runtime and is the first line of defense. Salting
  * is the explicit fallback for the cases AQE can't fix — e.g. one key
  * carrying 30% of a 100 TB fact table, where even a split partition pins
  * a single reducer per key-fragment pair on the build side.
  */
object SkewOps {

  /** Salted equi-join: the skewed (big) side spreads each key over
    * `saltBuckets` sub-keys via a deterministic per-row salt; the small
    * side replicates each row into all buckets (explode of a literal
    * range — ×saltBuckets rows, so keep the small side small). Result is
    * row-identical to `big.join(small, key)` but the shuffle partitions by
    * (key, salt), bounding any reducer to 1/saltBuckets of a hot key.
    *
    * `saltSource` must be a (near-)unique column on the big side — the
    * salt is `xxhash64(saltSource) % saltBuckets`, deterministic so runs
    * are reproducible (no rand()). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 saltSource: String, saltBuckets: Int,
                 joinType: String = "inner"): DataFrame = {
    // right/full outer would surface the small side's unmatched REPLICAS
    // as spurious null-padded rows (one per empty salt bucket).
    require(Set("inner", "left", "left_outer", "left_semi", "left_anti")
      .contains(joinType.toLowerCase),
      s"saltedJoin supports inner/left-ish joins, not $joinType")
    val salted = big.withColumn("__salt",
      pmod(xxhash64(col(saltSource)), lit(saltBuckets.toLong)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(saltBuckets - 1L))))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Key-frequency profile: the top-n heaviest keys with counts and their
    * share — run this before deciding on salting (one cheap agg). */
  def keySkewProfile(df: DataFrame, key: String, topN: Int = 20): DataFrame = {
    val total = df.count()
    df.groupBy(col(key)).agg(count(lit(1)).as("cnt"))
      .withColumn("share", round(col("cnt") / lit(total.toDouble), 6))
      .orderBy(col("cnt").desc, col(key).asc)
      .limit(topN)
  }

  /** Hot-key diagnostic for a prospective join/aggregation key: the
    * top-`topN` heaviest keys with their share of the table and their
    * skew factor (multiples of the MEAN per-key load — the number AQE's
    * skew threshold and a salting factor are sized from). One
    * partial+final count aggregation + a TakeOrderedAndProject heap;
    * totals are a 1-row driver probe. Deterministic: ties order by key.
    *
    * Reading it: skew ≈ 1 everywhere → hash-partitioning balances;
    * a key with skew ≥ #shuffle-partitions pins a reducer → pre-salt it
    * ([[saltedJoin]]) or let AQE split, and broadcast if the OTHER side
    * is small. */
  def skewReport(df: DataFrame, key: String, topN: Int = 20): DataFrame = {
    val counts = graft.Caches.track(
      df.groupBy(col(key).as("key")).agg(count(lit(1)).as("cnt"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // grand total + key count: 1-row probe over the keyed aggregate
    val t = counts.agg(sum(col("cnt")), count(lit(1))).head()
    val total = t.getLong(0)
    val nkeys = t.getLong(1)
    counts
      .select(col("key"), col("cnt"),
        graft.ops.TextOps.round6(
          col("cnt").cast("double") / lit(total.toDouble)).as("share6"),
        graft.ops.TextOps.round6(
          col("cnt").cast("double") * lit(nkeys.toDouble)
            / lit(total.toDouble)).as("skew6"))
      .orderBy(col("cnt").desc, col("key").asc)
      .limit(topN)
  }
}
