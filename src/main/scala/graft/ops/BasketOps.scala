package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Market-basket association-rule mining — the co-occurrence analytics
  * ("users who bought A also bought B") a product-analytics or
  * data-mixture engine runs over any (basket, item) incidence:
  * orders×parts, documents×sources, sessions×event types.
  *
  * No reference sibling (the 399-LoC reference has no joins at all);
  * the relational shape is the textbook two-pass Apriori cut at pair
  * rules: item counts, pair counts via the per-basket self-join, rules
  * closed by exact integer ratios.
  */
object BasketOps {

  /** Pair association rules A→B over a (basket, item) incidence frame:
    * `support = n_AB/N`, `confidence = n_AB/n_A`,
    * `lift = N·n_AB/(n_A·n_B)` — both directions of every co-occurring
    * pair with `n_AB ≥ minPairs`.
    *
    * Scale shape: one DISTINCT projection (exact-dedup discipline), one
    * keyed per-basket self-join whose fan-out is basket-size-bounded
    * (never all-pairs across baskets), two partial+final count
    * aggregations, and two broadcast-sized joins back onto the ≤|items|
    * count frame. N closes as a 1-row probe.
    *
    * Determinism: every statistic is ONE fixed-association expression
    * over exact BIGINT counts (products first, one division), snapped
    * to the 6dp floor grid — bit-identical in any engine. Assumes
    * N·n_AB and n_A·n_B stay under 2⁵³ as exact doubles (holds through
    * ~10⁸ baskets × 10⁷-count items). */
  def associationRules(df: DataFrame, basketCol: String, itemCol: String,
                       minPairs: Long): DataFrame = {
    val inc = graft.Caches.track(df
      .select(col(basketCol).as("b"), col(itemCol).as("i"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK))
    val n = inc.select(col("b")).distinct().count() // 1-value N probe
    require(n > 0, "associationRules needs baskets")
    val itemCnt = inc.groupBy(col("i")).agg(count(lit(1)).as("ni"))
    val pairs = inc.as("a").join(inc.as("c"),
        col("a.b") === col("c.b") && col("a.i") =!= col("c.i"))
      .groupBy(col("a.i").as("ante"), col("c.i").as("cons"))
      .agg(count(lit(1)).as("nab"))
      .filter(col("nab") >= minPairs)
    val joined = pairs
      .join(itemCnt.select(col("i").as("ante"), col("ni").as("na")),
        Seq("ante"))
      .join(itemCnt.select(col("i").as("cons"), col("ni").as("nb")),
        Seq("cons"))
    def r6(c: org.apache.spark.sql.Column) =
      floor(c * lit(1e6) + lit(0.5)) / lit(1e6)
    joined.select(col("ante"), col("cons"), col("nab"), col("na"),
      col("nb"),
      r6(col("nab").cast("double") / lit(n.toDouble)).as("support6"),
      r6(col("nab").cast("double") / col("na").cast("double"))
        .as("conf6"),
      r6(lit(n.toDouble) * col("nab").cast("double")
        / (col("na").cast("double") * col("nb").cast("double")))
        .as("lift6"))
  }
}
