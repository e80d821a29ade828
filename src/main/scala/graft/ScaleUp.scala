package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SCALE-REHEARSAL fixture synthesizer: writes an sf(0.1·F) fixture set
  * from the sf0.1 driver fixtures by FK-consistent replication — every
  * correctness claim stays pinned to the DRIVER's fixtures (this output
  * is never oracle-compared; it exists so the scale story can be
  * MEASURED instead of argued from plan shape).
  *
  * Replication scheme (copy c ∈ [0, F)):
  *  - dimensions (region, nation) copy through unchanged — exactly how
  *    TPC-H scales (nation/region are constant across SF).
  *  - every fact/entity key k becomes k + c·(max(k)+1): joins stay
  *    consistent per copy (orders.o_custkey moves WITH customer,
  *    lineitem's three FKs move with their parents), copies never
  *    cross-join, and key-range-derived ids (liIdx = l_orderkey·10 +
  *    l_linenumber) stay collision-free per copy.
  *  - documents: copy 0 is verbatim; for c>0 a deterministic ~2/3 of
  *    docs get a " copy c" suffix (and recomputed n_chars), leaving
  *    ~1/3 EXACT cross-copy duplicates — dedup gates at scale see a
  *    realistic crawl-like dup rate instead of either extreme (10
  *    identical copies of everything would make the ExactSubstr
  *    verify sliver the whole corpus; all-distinct would make the
  *    screens trivially empty).
  *  - embeddings: ids offset, vectors verbatim (cross-copy exact
  *    vector dups are the honest analogue of re-crawled pages; ANN
  *    probes and k-means just see denser clusters).
  *  - events: ids offset per copy, timestamps verbatim (the replay
  *    gates' watermark progressions are per-user; 10× users at the
  *    same instants is exactly "more traffic").
  *
  * Usage: runMain graft.ScaleUp <srcDir> <outDir> <factor>
  * (e.g. /root/testdata/sf0.1 target/testdata/sf1 10). */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val Array(src, out, fs) = args.take(3)
    val factor = fs.toInt
    val spark =
      Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
        "graft-scaleup")
    try run(spark, src, out, factor) finally spark.stop()
  }

  def run(spark: SparkSession, src: String, out: String,
          factor: Int): Unit = {
    def tbl(n: String) = spark.read.parquet(s"$src/$n.parquet")
    def write(df: DataFrame, n: String, parts: Int): Unit = {
      df.repartition(parts)
        .write.mode("overwrite").parquet(s"$out/$n.parquet")
      println(s"[scaleup] $n x$factor -> $out/$n.parquet")
    }
    // one bounded scalar per keyed table: the per-copy key stride
    def stride(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).head.getLong(0) + 1L
    val cpy = col("__c")
    def rep(df: DataFrame): DataFrame = df
      .withColumn("__c", explode(sequence(lit(0L), lit(factor - 1L))))
    def off(k: String, s: Long): Column = col(k) + cpy * lit(s)

    write(tbl("region"), "region", 1)
    write(tbl("nation"), "nation", 1)

    val custS = stride(tbl("customer"), "c_custkey")
    val suppS = stride(tbl("supplier"), "s_suppkey")
    val partS = stride(tbl("part"), "p_partkey")
    val ordS = stride(tbl("orders"), "o_orderkey")
    write(rep(tbl("customer"))
      .select(off("c_custkey", custS).as("c_custkey"), col("c_name"),
        col("c_nationkey"), col("c_acctbal"), col("c_mktsegment")),
      "customer", 4)
    write(rep(tbl("supplier"))
      .select(off("s_suppkey", suppS).as("s_suppkey"), col("s_name"),
        col("s_nationkey"), col("s_acctbal")), "supplier", 1)
    write(rep(tbl("part"))
      .select(off("p_partkey", partS).as("p_partkey"), col("p_name"),
        col("p_brand"), col("p_type"), col("p_size"),
        col("p_retailprice")), "part", 4)
    write(rep(tbl("orders"))
      .select(off("o_orderkey", ordS).as("o_orderkey"),
        off("o_custkey", custS).as("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), col("o_orderdate"), col("o_orderpriority")),
      "orders", 16)
    write(rep(tbl("lineitem"))
      .select(off("l_orderkey", ordS).as("l_orderkey"),
        off("l_partkey", partS).as("l_partkey"),
        off("l_suppkey", suppS).as("l_suppkey"), col("l_linenumber"),
        col("l_quantity"), col("l_extendedprice"), col("l_discount"),
        col("l_tax"), col("l_returnflag"), col("l_linestatus"),
        col("l_shipdate")), "lineitem", 32)

    val ev = tbl("events")
    val evS = stride(ev, "event_id")
    val usrS = stride(ev, "user_id")
    write(rep(ev)
      .select(off("event_id", evS).as("event_id"), col("ts"),
        off("user_id", usrS).as("user_id"), col("event_type"),
        col("value"), col("props")), "events", 16)

    val doc = tbl("documents")
    val docS = stride(doc, "doc_id")
    write(rep(doc)
      .withColumn("text",
        when(cpy > 0 && pmod(col("doc_id") + cpy, lit(3)) =!= 0,
          concat(col("text"), lit(" copy "), cpy))
          .otherwise(col("text")))
      .select(off("doc_id", docS).as("doc_id"), col("text"), col("lang"),
        col("source"), length(col("text")).cast("long").as("n_chars")),
      "documents", 8)

    val emb = tbl("embeddings")
    val vecS = stride(emb, "vec_id")
    write(rep(emb)
      .select(off("vec_id", vecS).as("vec_id"), col("embedding"),
        col("label")), "embeddings", 8)
  }
}
