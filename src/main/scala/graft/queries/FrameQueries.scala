package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.core.GFrame

/** Driver-contract queries for the GFrame (DataFrame) layer — the layer the
  * reference declared but never built (pontem/dataframe/__init__.py is empty;
  * README.md:16-19 sketches column-assignment arithmetic).
  *
  * Scale notes per query are inline; the common rules:
  *  - fact-side scans project only needed columns (Catalyst prunes to the
  *    parquet ReadSchema) and filters push down;
  *  - dimension joins broadcast (no fact shuffle);
  *  - aggregations are partial+final HashAggregate;
  *  - floating aggregates rounded (2dp money / 6dp ratios) so accumulation
  *    order can't flip the driver's hash compare; per-row arithmetic exact.
  */
object FrameQueries {

  private def liIdx = col("l_orderkey") * 10 + col("l_linenumber")
  private val liIdxSql = "l_orderkey*10 + l_linenumber"

  /** TPC-H Q10 analog — ONE text, both engines (the f19 contract). The
    * fixture's o_orderdate spans 1995–2001, so the quarter window sits
    * inside it; revenue ties break on the unique c_custkey. */
  private val Q10Sql =
    """SELECT c_custkey, c_name,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
         n_name
       FROM customer JOIN orders ON c_custkey = o_custkey
       JOIN lineitem ON l_orderkey = o_orderkey
       JOIN nation ON c_nationkey = n_nationkey
       WHERE o_orderdate >= DATE '1996-04-01'
         AND o_orderdate < DATE '1996-07-01'
         AND l_returnflag = 'R'
       GROUP BY c_custkey, c_name, n_name
       ORDER BY revenue DESC, c_custkey LIMIT 20"""

  // f68: ONE SQL text both engines parse and execute (the f45 contract)
  // exercising arbitrary GROUPING SETS — the general form rollup (f12)
  // and cube (f46) are special cases of; quantities are integral-valued
  // doubles, so the parallel sums are exact with no rounding grid.
  private val GroupingSetsSql =
    """SELECT l_returnflag, l_linestatus,
         count(*) AS n, sum(l_quantity) AS sum_qty
       FROM lineitem
       GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
         (l_returnflag), ())
       ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"""

  // f79: CORRELATED subqueries through ONE SQL text (the f45 contract):
  // a correlated SCALAR count in the select list plus EXISTS and
  // NOT EXISTS membership predicates — Catalyst decorrelates the three
  // into a left-outer aggregate join, a semi join, and an anti join;
  // every predicate is exact equality/count, so no float boundary can
  // flip membership between engines.
  private val CorrelatedSql =
    """SELECT c.c_custkey,
         (SELECT CAST(count(*) AS BIGINT) FROM orders o
          WHERE o.o_custkey = c.c_custkey) AS n_orders
       FROM customer c
       WHERE EXISTS (SELECT 1 FROM orders o
               WHERE o.o_custkey = c.c_custkey
                 AND o.o_orderstatus = 'O')
         AND NOT EXISTS (SELECT 1 FROM orders o
               WHERE o.o_custkey = c.c_custkey
                 AND o.o_orderstatus = 'F')
       ORDER BY c.c_custkey"""

  // f71: FILTER (WHERE …) conditional aggregates through ONE SQL text
  // both engines execute — quantities sum exactly (integral doubles).
  private val FilterAggSql =
    """SELECT l_returnflag,
         count(*) AS n,
         count(*) FILTER (WHERE l_discount > 0.05) AS n_disc,
         sum(l_quantity) FILTER (WHERE l_linestatus = 'F') AS qty_f
       FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""

  // f73: standard window functions through ONE SQL text both engines
  // execute — keyed ROWS frame, ranking, and lag on a TOTAL sort
  // ((orderkey, linenumber) alone is not unique — the f70 lesson);
  // quantities are integral doubles, so the frame sums are exact.
  private val WindowParitySql =
    """SELECT l_orderkey, l_linenumber,
         sum(l_quantity) OVER (PARTITION BY l_returnflag
           ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice
           ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS qty_10,
         CAST(row_number() OVER (PARTITION BY l_returnflag
           ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice)
           AS BIGINT) AS rn,
         lag(l_quantity) OVER (PARTITION BY l_returnflag
           ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice)
           AS prev_qty
       FROM lineitem
       ORDER BY l_returnflag, rn"""

  private def li(s: SparkSession, d: String): GFrame =
    GFrame.fromDF(Tables.lineitem(s, d).withColumn("idx", liIdx), "idx")
  private def ord(s: SparkSession, d: String): GFrame =
    GFrame.fromDF(Tables.orders(s, d), "o_orderkey")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // README flagship shape df['new'] = df['a'] * expr — same-base Series
    // assignment collapses to one projected scan, zero joins.
    "f01_assign_revenue" -> ((s, d) => {
      val gf = li(s, d)
      val rev = gf("l_extendedprice") * ((gf("l_discount") * -1.0) + 1.0)
      gf.assign("revenue", rev).select("revenue")
        .sortValues(col("idx")).toDF.select("idx", "revenue")
    }),

    // Filter + projection — predicate and column pruning reach the scan.
    "f02_filter_project" -> ((s, d) => {
      li(s, d)
        .filter(col("l_shipdate") >= lit("1999-01-01").cast("timestamp")
          && col("l_quantity") < 10)
        .select("l_quantity", "l_extendedprice")
        .sortValues(col("idx")).toDF
    }),

    // TPC-H Q1 shape: groupBy two low-cardinality keys, 4 aggregates in one
    // partial+final HashAggregate pass.
    "f03_q1_agg" -> ((s, d) => {
      li(s, d).groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice").cast("decimal(30,8)")), 2)
            .cast("double").as("sum_px"), // decimal: order-free exact sum
          round(avg(col("l_discount")), 6).as("avg_disc"),
          count(lit(1)).as("cnt"))
        .sortValues(col("l_returnflag"), col("l_linestatus")).toDF
    }),

    // Fact⨝dim equi-join then agg; customer is the small side → broadcast,
    // so the orders fact never shuffles for the join.
    "f04_join_agg" -> ((s, d) => {
      val o = ord(s, d)
      val c = GFrame.fromDF(Tables.customer(s, d), "c_custkey")
      o.join(c, o.df("o_custkey") === c.df("c_custkey"), broadcastRight = true)
        .groupBy("c_mktsegment")
        .agg(round(sum(col("o_totalprice").cast("decimal(30,8)")), 2)
          .cast("double").as("sum_price"),
          count(lit(1)).as("cnt"))
        .sortValues(col("c_mktsegment")).toDF
    }),

    // Star join through two broadcast dims (supplier → nation): revenue per
    // nation. At 100 TB the lineitem side streams; dims replicate.
    "f05_broadcast_dims" -> ((s, d) => {
      val gf = li(s, d)
      val sup = GFrame.fromDF(Tables.supplier(s, d), "s_suppkey")
      val nat = GFrame.fromDF(Tables.nation(s, d), "n_nationkey")
      gf.withColumn("revenue",
          col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .join(sup, col("l_suppkey") === sup.df("s_suppkey"), broadcastRight = true)
        .join(nat, col("s_nationkey") === nat.df("n_nationkey"), broadcastRight = true)
        .groupBy("n_name")
        .agg(round(sum(col("revenue").cast("decimal(30,8)")), 2)
          .cast("double").as("revenue"))
        .sortValues(col("n_name")).toDF
    }),

    // Top-k: Catalyst TakeOrderedAndProject — per-partition heaps, no global
    // sort. Unique tiebreak (orderkey) keeps it deterministic.
    "f06_topk_orders" -> ((s, d) =>
      ord(s, d).sortValues(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10).toDF.select("o_orderkey", "o_totalprice")),

    // Window rank: one shuffle on the partition key, per-partition sort.
    "f07_window_rank" -> ((s, d) =>
      ord(s, d)
        .withRank("rk", Seq(col("o_custkey")),
          Seq(col("o_totalprice").desc, col("o_orderkey").asc))
        .filter(col("rk") <= 3)
        .sortValues(col("o_custkey"), col("rk")).toDF
        .select("o_custkey", "o_orderkey", "rk")),

    // Running aggregate per customer (rows unbounded-preceding..current):
    // sequential in-frame accumulation → deterministic.
    "f08_running_sum" -> ((s, d) =>
      ord(s, d)
        .withRunning("run_total", sum(col("o_totalprice")),
          Seq(col("o_custkey")), Seq(col("o_orderdate"), col("o_orderkey")))
        .withColumn("run_total", round(col("run_total"), 2))
        .sortValues(col("o_orderkey")).toDF
        .select("o_orderkey", "run_total")),

    // Distinct pair enumeration — partial distinct before the shuffle.
    "f09_distinct" -> ((s, d) =>
      li(s, d).toDF.select("l_returnflag", "l_linestatus").distinct()
        .orderBy("l_returnflag", "l_linestatus")),

    // Set op: customers with no orders (EXCEPT → left-anti under the hood).
    "f10_except" -> ((s, d) => {
      val c = GFrame.fromDF(
        Tables.customer(s, d).select(col("c_custkey")), "c_custkey")
      val o = GFrame.fromDF(
        Tables.orders(s, d).select(col("o_custkey").as("c_custkey")), "c_custkey")
      c.except(o).sortValues(col("c_custkey")).toDF
    }),

    // Semi join: customers WITH orders, grouped — exercises left_semi (probe
    // side streams; no row duplication, unlike inner join + distinct).
    "f11_semi_join" -> ((s, d) => {
      val c = GFrame.fromDF(Tables.customer(s, d), "c_custkey")
      val o = ord(s, d)
      c.semiJoin(o, c.df("c_custkey") === o.df("o_custkey"))
        .groupBy("c_mktsegment").agg(count(lit(1)).as("cnt"))
        .sortValues(col("c_mktsegment")).toDF
    }),

    // Rollup: hierarchical subtotals in one pass (Expand + HashAggregate).
    // Null grouping keys coalesced to 'ALL' on both sides for a stable sort.
    "f12_rollup" -> ((s, d) =>
      li(s, d).rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
          count(lit(1)).as("cnt"))
        .toDF
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("status"),
          col("sum_qty"), col("cnt"))
        .orderBy("flag", "status")),

    // CUBE: all 2^k grouping-set combinations in one Expand pass below
    // the partial aggregation (f12's rollup sibling — the Expand fans
    // out map-side, the exchange carries per-set partials).
    "f46_cube" -> ((s, d) =>
      li(s, d).cube(col("l_returnflag"), col("l_linestatus"))
        .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
          count(lit(1)).as("cnt"))
        .toDF
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("status"),
          col("sum_qty"), col("cnt"))
        .orderBy("flag", "status")),

    // Pivot with explicit values — single groupBy pass, no discovery job.
    "f13_pivot" -> ((s, d) =>
      li(s, d).toDF.groupBy("l_linestatus")
        .pivot("l_returnflag", Seq("A", "N", "R"))
        .agg(round(sum(col("l_quantity")), 2))
        .orderBy("l_linestatus"))
    ,
    // Salted join (skew mitigation): row-identical to the plain join —
    // the oracle IS the plain join — but shuffles on (key, salt) so a hot
    // key spreads over 8 reducers.
    "f14_salted_join" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey").as("c_custkey"))
      val c = Tables.customer(s, d).select(col("c_custkey"), col("c_mktsegment"))
      graft.ops.SkewOps.saltedJoin(o, c, "c_custkey", "o_orderkey", 8)
        .groupBy("c_mktsegment").agg(count(lit(1)).as("cnt"))
        .orderBy("c_mktsegment")
    }),

    // TPC-H Q3 analog: 3-way join with selective filters on both dims,
    // revenue per order, top 10. Dims broadcast; lineitem streams.
    "f16_q3_shipping" -> ((s, d) => {
      val cust = Tables.customer(s, d)
        .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey", "o_orderdate")
      val liDf = Tables.lineitem(s, d)
        .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
      GFrame.fromDF(liDf, "l_orderkey")
        .join(GFrame.fromDF(o, "o_orderkey"),
          col("l_orderkey") === col("o_orderkey"), broadcastRight = true)
        .join(GFrame.fromDF(cust, "c_custkey"),
          col("o_custkey") === col("c_custkey"), broadcastRight = true)
        .groupBy("l_orderkey", "o_orderdate")
        // per-row product in double (exact IEEE both engines), then decimal
        // ACCUMULATION — decimal×decimal precision/scale rules differ
        // across engines, so never multiply in decimal.
        .agg(round(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast("decimal(30,8)")), 2)
          .cast("double").as("revenue"))
        .sortValues(col("revenue").desc, col("l_orderkey").asc)
        .limit(10).toDF
    }),

    // TPC-H Q18 analog: large⨝large SortMergeJoin — orders⨝lineitem with a
    // groupBy-HAVING semi filter on the probe side. NEITHER side broadcasts
    // (merge hints pin SMJ): lineitem aggregates partial+final to per-order
    // quantity sums, the HAVING survivors semi-join orders, and the
    // surviving orders re-join lineitem — every shuffle keyed by orderkey,
    // so at 100 TB the plan is three keyed exchanges and zero driver state.
    "f17_q18_smj" -> ((s, d) => {
      val liDf = Tables.lineitem(s, d).select("l_orderkey", "l_quantity")
      val big = GFrame.fromDF(
        liDf.groupBy("l_orderkey")
          .agg(sum(col("l_quantity")).as("sum_qty"))
          .filter(col("sum_qty") > 200), "l_orderkey")
      val o = GFrame.fromDF(
        Tables.orders(s, d).select("o_orderkey", "o_custkey", "o_totalprice"),
        "o_orderkey")
      o.joinSortMerge(big, col("o_orderkey") === big.df("l_orderkey"),
          "left_semi")
        .joinSortMerge(GFrame.fromDF(liDf, "l_orderkey"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderkey", "o_custkey", "o_totalprice")
        .agg(round(sum(col("l_quantity")), 2).as("sum_qty"))
        .sortValues(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(100).toDF
    }),

    // SINK under the hash gate: write lineitem partitioned by returnflag,
    // read it back, and aggregate one partition — the read-back scan must
    // prune to the l_returnflag=A directory (partition pruning on the
    // written layout), and the values must round-trip parquet bit-exactly.
    // Small-file compaction round-trip: fragment documents into 64
    // part files, compact by target byte size (count from the input
    // LISTING, no data scan), and hash-match the compacted scan against
    // the source table — the table-maintenance pass a streaming sink's
    // droppings need at 100 TB.
    // BENFORD first-digit audit: the classic fabricated-data screen —
    // leading-digit distribution of order totals vs Benford expected
    // shares, per-digit chi² contributions. Digit extraction through
    // exact integer cents (never float log10 — a 1-ulp libm difference
    // at a power of 10 would misbin); expected shares are pinned 6dp
    // LITERALS on both engines (log10 itself may differ by an ulp
    // between libms).
    "f75_benford" -> ((s, d) => {
      import s.implicits._
      val digits = Tables.orders(s, d).select(
        substring(floor(col("o_totalprice") * 100 + 0.5).cast("long")
          .cast("string"), 1, 1).cast("int").as("digit"))
      val counts = digits.groupBy("digit").agg(count(lit(1)).as("n"))
      val pdf = Seq(1 -> 0.301030, 2 -> 0.176091, 3 -> 0.124939,
          4 -> 0.096910, 5 -> 0.079181, 6 -> 0.066947, 7 -> 0.057992,
          8 -> 0.051153, 9 -> 0.045757)
        .toDF("digit", "expected6")
      // a constant-key 1-row join constant-folds its predicate away and
      // replans as a nested loop (PlanLint-rejected) — the 1-value total
      // rides as a bounded driver scalar instead
      val total = counts.agg(sum(col("n"))).head().getLong(0) // 1-value digit total
      counts.join(broadcast(pdf), "digit")
        .select(col("digit"), col("n"),
          graft.ops.TextOps.round6(col("n") * lit(1.0) / lit(total))
            .as("share6"),
          col("expected6"),
          graft.ops.TextOps.round6(
            (col("n") - lit(total) * col("expected6"))
              * (col("n") - lit(total) * col("expected6"))
              / (lit(total) * col("expected6"))).as("contrib6"))
        .orderBy("digit")
    }),

    // Per-nation ROBUST outlier report: |x − median| > 3·1.4826·MAD
    // (the screen a mean/stddev z-score fails exactly when it matters —
    // the outliers poison the mean). Two keyed exact percentiles + one
    // keyed conditional count; raw med/mad doubles hash-match via the
    // quantile_cont interpolation precedent.
    "f76_mad_outliers" -> ((s, d) =>
      graft.ops.ValidateOps.madOutliers(Tables.customer(s, d),
          "c_nationkey", "c_acctbal", kScaled = 4.4478)
        .orderBy("c_nationkey")),

    // SCHEMA EVOLUTION read: two writer generations land different
    // column sets (gen1: doc_id+n_chars, gen2: doc_id+lang — the
    // long-lived-table reality at 100 TB where producers upgrade at
    // different times); one mergeSchema scan unions the schemas with
    // nulls where a generation lacks the column, and the rollup proves
    // no rows or values are lost. Oracle recreates the generations
    // relationally from the source table.
    "f74_schema_evolution" -> ((s, d) => {
      val root = java.nio.file.Files
        .createTempDirectory("graft_f74_evo").toString
      val docs = Tables.documents(s, d)
      docs.filter(pmod(col("doc_id"), lit(2)) === 0)
        .select(col("doc_id"), length(col("text")).as("n_chars"))
        .write.mode("overwrite").parquet(s"$root/gen1")
      docs.filter(pmod(col("doc_id"), lit(2)) =!= 0)
        .select(col("doc_id"), col("lang"))
        .write.mode("overwrite").parquet(s"$root/gen2")
      val merged = s.read.option("mergeSchema", "true")
        .parquet(s"$root/gen1", s"$root/gen2")
      val res = merged
        .groupBy(coalesce(col("lang"), lit("none")).as("lang"))
        .agg(count(lit(1)).as("n_docs"),
          coalesce(sum(col("n_chars")), lit(0L)).as("sum_chars"))
        .orderBy("lang")
        .localCheckpoint(true)
      val p = new org.apache.hadoop.fs.Path(root)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      res
    }),

    "f72_compact" -> ((s, d) => {
      val frag = java.nio.file.Files
        .createTempDirectory("graft_f72_frag").toString
      val out = java.nio.file.Files
        .createTempDirectory("graft_f72_out").toString
      Tables.documents(s, d).repartition(64)
        .write.mode("overwrite").parquet(frag)
      graft.sources.Sources.compact(s, frag, out,
        targetBytes = 8L * 1024 * 1024)
      val res = s.read.parquet(out)
        .select(col("doc_id"), md5(encode(col("text"), "UTF-8")).as("fp"))
        .orderBy("doc_id")
        .localCheckpoint(true)
      Seq(frag, out).foreach { dir =>
        val p = new org.apache.hadoop.fs.Path(dir)
        p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      }
      res
    }),

    // PERMISSIVE malformed-record ingest — m18's degradation story for
    // TEXT formats: the documents fixture round-trips through headerless
    // CSV with 3 spliced poisoned lines (a BIGINT cast failure, an
    // unterminated quote, a token-count overflow); the scan must not
    // fail (FAILFAST) or silently drop them (DROPMALFORMED) — they land
    // RAW in the _corrupt_record quarantine while the 500 healthy rows
    // hash-match the fixture. Parsed fields of quarantined rows are
    // masked (PERMISSIVE keeps partial results, which is triage detail,
    // not contract). Unique temp dir + localCheckpoint + delete.
    "f77_bad_records" -> ((s, d) => {
      val out = java.nio.file.Files
        .createTempDirectory("graft_f77_csv").toString
      Tables.documents(s, d).select("doc_id", "source", "text")
        .write.mode("overwrite").option("header", "false")
        .csv(s"$out/data")
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$out/data/zz-poisoned.csv"),
        java.util.Arrays.asList(
          "xx,src0,doc id fails the bigint cast",
          "7,\"src1,unterminated quote never closes",
          "8,src2,token count,overflows,the,schema"))
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("source",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType)))
      val parsed = graft.sources.Sources.csvPermissive(
        s, s"$out/data", schema)
      val ok = col("_corrupt_record").isNull
      val res = parsed
        .select(when(ok, col("doc_id")).as("doc_id"),
          when(ok, col("source")).as("source"),
          when(ok, md5(encode(col("text"), "UTF-8"))).as("fp"),
          col("_corrupt_record").as("raw"),
          col("_corrupt_record").isNotNull.as("quarantined"))
        .orderBy("quarantined", "doc_id", "raw")
        .localCheckpoint(true)
      val p = new org.apache.hadoop.fs.Path(out)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      res
    }),

    "f20_write_roundtrip" -> ((s, d) => {
      // unique per-invocation dir (the d18 rule: concurrent runs on one
      // machine must not clobber each other's layout mid-query)
      val out = java.nio.file.Files
        .createTempDirectory("graft_f20_roundtrip").toString
      graft.sources.Sources.writePartitioned(
        Tables.lineitem(s, d)
          .select("l_orderkey", "l_linenumber", "l_returnflag",
            "l_linestatus", "l_quantity"),
        out, Seq("l_returnflag"))
      val res = s.read.parquet(out)
        .filter(col("l_returnflag") === "A")
        .groupBy("l_linestatus")
        .agg(count(lit(1)).as("n"),
          round(sum(col("l_quantity")), 2).as("qty"))
        .orderBy("l_linestatus")
        .localCheckpoint(true)
      val p = new org.apache.hadoop.fs.Path(out)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      res
    }),

    // Z-ORDER clustered sink under the hash gate: write lineitem sorted
    // by the Morton interleave of (l_partkey, l_suppkey), read it back
    // through a two-dimensional range predicate, and match the plain
    // filter on the source table — values must survive the re-layout
    // bit-exactly while the written row groups carry tight min/max on
    // BOTH keys (the multi-column data-skipping layout at 100 TB).
    "f39_zorder_roundtrip" -> ((s, d) => {
      val out = java.nio.file.Files
        .createTempDirectory("graft_f39_zorder").toString
      graft.sources.Sources.writeZOrdered(
        Tables.lineitem(s, d)
          .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
            "l_quantity"),
        out, col("l_partkey"), col("l_suppkey"))
      val res = s.read.parquet(out)
        .filter(col("l_partkey").between(100, 300)
          && col("l_suppkey").between(10, 60))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_suppkey"), round(col("l_quantity"), 2).as("qty"))
        .orderBy("l_orderkey", "l_linenumber")
        .localCheckpoint(true)
      val p = new org.apache.hadoop.fs.Path(out)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      res
    }),

    // pandas groupby().transform(): per-nation mean/std broadcast back
    // onto every customer row → demeaned + z-scored balance (the standard
    // ML feature-prep shape). Whole-partition unordered frames — one
    // shuffle on the key, NO sort, no self-join.
    "f23_group_transform" -> ((s, d) => {
      val gf = graft.core.GFrame.fromDF(Tables.customer(s, d), "c_custkey")
      gf.withGroupAgg("nmean", avg(col("c_acctbal")), Seq(col("c_nationkey")))
        .withGroupAgg("nstd", stddev_samp(col("c_acctbal")),
          Seq(col("c_nationkey")))
        .df
        .select(col("c_custkey"), col("c_nationkey"),
          round(col("c_acctbal") - col("nmean"), 6).as("demeaned"),
          round(try_divide(col("c_acctbal") - col("nmean"), col("nstd")), 6)
            .as("zscore"))
        .orderBy("c_custkey")
    }),

    // pandas df.describe(): every stat for every column from ONE
    // partial+final aggregate pass, stack-pivoted to stat×column rows.
    // Quartiles are the exact sort-based percentile (= quantile_cont).
    "f22_describe" -> ((s, d) => {
      val desc = graft.core.GFrame
        .fromDF(Tables.customer(s, d), "c_custkey")
        .describe("c_custkey", "c_nationkey", "c_acctbal").df
      desc.select(col("stat"),
          round(col("c_custkey"), 6).as("c_custkey"),
          round(col("c_nationkey"), 6).as("c_nationkey"),
          round(col("c_acctbal"), 6).as("c_acctbal"))
        .orderBy("stat")
    }),

    // describe with SKETCHED quartiles (percentile_approx): the 100 TB
    // default — fixed-size mergeable sketch state instead of the exact
    // percentile's per-group value buffer. Sketch quartiles are actual
    // column elements (no interpolation, not cross-engine comparable),
    // so the stat×column layout splits: the five exact stat rows
    // (identical aggregates in both variants) hash-gate verbatim, and
    // each quartile row becomes a `p%_ok` indicator row — 1.0 iff the
    // sketch element sits inside the exact p∓0.002 percentile band
    // (≥ 20× the accuracy-10000 rank guarantee at fixture n; the band
    // probe is one 1-row exact aggregate turned into driver literals —
    // no 1-row cross join in the plan). The oracle spells the ok rows
    // as 1.0: an out-of-bound sketch is a hash mismatch.
    "f24_describe_approx" -> ((s, d) => {
      val cols = Seq("c_custkey", "c_nationkey", "c_acctbal")
      val base = Tables.customer(s, d)
      val ap = graft.core.GFrame.fromDF(base, "c_custkey")
        .describeApprox(10000, cols: _*).df
      val bandAggs = cols.flatMap(c => Seq(25, 50, 75).flatMap(p => Seq(
        expr(s"percentile($c, ${(p - 0.2) / 100.0})").as(s"lo${p}__$c"),
        expr(s"percentile($c, ${(p + 0.2) / 100.0})").as(s"hi${p}__$c"))))
      val b = base.agg(bandAggs.head, bandAggs.tail: _*)
        .head() // 1-row band probe: 18 exact percentiles, driver literals
      def okCol(c: String): org.apache.spark.sql.Column = {
        def ok(p: Int): org.apache.spark.sql.Column =
          when(col(c) >= lit(b.getAs[Double](s"lo${p}__$c"))
            && col(c) <= lit(b.getAs[Double](s"hi${p}__$c")), 1.0)
            .otherwise(0.0)
        when(col("stat") === "25%", ok(25))
          .when(col("stat") === "50%", ok(50))
          .otherwise(ok(75)).as(c)
      }
      val exactRows = ap
        .filter(!col("stat").isin("25%", "50%", "75%"))
        .select(col("stat") +: cols.map(c => round(col(c), 6).as(c)): _*)
      val okRows = ap.filter(col("stat").isin("25%", "50%", "75%"))
        .select(concat(col("stat"), lit("_ok")).as("stat")
          +: cols.map(okCol): _*)
      exactRows.unionByName(okRows).orderBy("stat")
    }),

    // Sketch aggregates, the 100 TB statistics path: HyperLogLog++ distinct
    // counts + Greenwald–Khanna approximate medians are fixed-size MERGEABLE
    // partial aggregates — the shuffle carries one small sketch per
    // (group, partition) instead of every distinct value / a full sort.
    // Sketch VALUES are engine-specific, so the gate emits the exact
    // group stats hash-gated PLUS per-sketch IN-BOUND indicators — the
    // exact twin computed in the same aggregate certifies each sketch
    // inside its published error bound (HLL: 3·rsd = 6% + 3 absolute;
    // GK at accuracy 10000: the exact 0.5∓0.002 percentile band — 20×
    // the n/accuracy rank guarantee at fixture group sizes), and the
    // oracle spells the indicators as literal TRUE: a sketch outside
    // its bound is a HASH MISMATCH, not a silent pass.
    "f21_sketch_stats" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_orderpriority").as("priority"))
        .agg(count(lit(1)).as("n_orders"),
          countDistinct(col("o_custkey")).as("nd_cust_exact"),
          approx_count_distinct(col("o_custkey"), 0.02).as("__nd"),
          min(col("o_totalprice")).as("min_price"),
          max(col("o_totalprice")).as("max_price"),
          percentile_approx(col("o_totalprice"), lit(0.5), lit(10000))
            .as("__med"),
          expr("percentile(o_totalprice, 0.498)").as("__mlo"),
          expr("percentile(o_totalprice, 0.502)").as("__mhi"))
        .select(col("priority"), col("n_orders"), col("nd_cust_exact"),
          (abs(col("__nd") - col("nd_cust_exact"))
            <= col("nd_cust_exact") * lit(0.06) + lit(3.0))
            .as("nd_in_bound"),
          col("min_price"), col("max_price"),
          (col("__med") >= col("__mlo") && col("__med") <= col("__mhi"))
            .as("med_in_bound"))
        .orderBy("priority")),

    // TPC-H Q5 analog through the spark.sql surface: 6-table star join,
    // region filter, revenue per nation. Same SQL text runs on DuckDB —
    // the declarative plan lets Catalyst broadcast the three dims and
    // shuffle the two facts on their join keys (AQE decides).
    "f19_q5_sql" -> ((s, d) => {
      graft.Tables.registerAll(s, d)
      s.sql("""
        SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM customer JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
        GROUP BY n_name ORDER BY revenue DESC, n_name""")
    }),

    // TPC-H Q10 analog through the spark.sql surface: returned-item
    // revenue per customer in a quarter — two fact joins shuffled on
    // their keys, nation broadcast, date + returnflag filters pushed to
    // the scans, top-20 as TakeOrderedAndProject. Same SQL text runs on
    // DuckDB.
    "f45_q10_sql" -> ((s, d) => {
      graft.Tables.registerAll(s, d)
      s.sql(Q10Sql)
    }),

    // Standard window functions through the SQL surface (the f45
    // contract): ROWS frame + ranking + lag on one keyed exchange.
    "f73_window_sql" -> ((s, d) => {
      graft.Tables.registerAll(s, d)
      s.sql(WindowParitySql)
    }),

    // Conditional aggregates (FILTER clause) through the SQL surface —
    // fused into ONE HashAggregate pass; the identical text runs on
    // DuckDB.
    "f71_filter_agg" -> ((s, d) => {
      graft.Tables.registerAll(s, d)
      s.sql(FilterAggSql)
    }),

    // Arbitrary GROUPING SETS through the SQL surface — one Expand
    // below a partial+final aggregate (the f12/f46 machinery, user-
    // chosen set list); the identical text runs on DuckDB.
    "f68_grouping_sets" -> ((s, d) => {
      graft.Tables.registerAll(s, d)
      s.sql(GroupingSetsSql)
    }),

    "f79_correlated_subquery" -> ((s, d) => {
      graft.Tables.registerAll(s, d)
      s.sql(CorrelatedSql)
    }),

    // Per-group exact quantiles: sort-based percentile aggregate within
    // groupBy (partial+final; exact, matches quantile_cont bit-for-bit —
    // the grouped sibling of s25's global quantiles).
    "f18_group_quantiles" -> ((s, d) =>
      GFrame.fromDF(Tables.lineitem(s, d), "l_orderkey")
        .groupBy("l_returnflag")
        .agg(
          round(percentile(col("l_quantity"), lit(0.5)), 6).as("med_qty"),
          round(percentile(col("l_extendedprice"), lit(0.95)), 6).as("p95_price"),
          count(lit(1)).as("n"))
        .sortValues(col("l_returnflag").asc).toDF),

    // Unpivot/melt: wide metrics → long rows via a single Expand pass.
    "f15_melt" -> ((s, d) =>
      GFrame.fromDF(Tables.lineitem(s, d)
          .withColumn("idx", liIdx)
          .select("idx", "l_quantity", "l_extendedprice", "l_tax"), "idx")
        .melt(Seq("l_quantity", "l_extendedprice", "l_tax"),
          "metric", "value")
        .sortValues(col("idx"), col("metric")).toDF),

    // pandas pd.crosstab: nation × market-segment frequency table — one
    // partial+final pivot-count pass over explicit values (no discovery
    // job), empty cells 0.
    "f25_crosstab" -> ((s, d) =>
      GFrame.fromDF(Tables.customer(s, d), "c_custkey")
        .crosstab("c_nationkey", "c_mktsegment",
          Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"))
        .sortValues(col("c_nationkey")).toDF),

    // Frame-level NA handling (pandas fillna/dropna + merge(on=...)): the
    // filled frame aggregates every event (nulls → -1 sentinel), the
    // dropped frame counts only real observations; a keyed left merge
    // re-aligns the two per-user aggregates. Two partial+final aggs +
    // one keyed join — no window, no driver state.
    "f26_na_handling" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("event_id"), col("user_id"),
        when(col("event_type") === "view", col("value")).as("v"))
      val gf = GFrame.fromDF(ev, "event_id")
      val filled = gf.fillna(-1.0, Seq("v")).groupBy("user_id")
        .agg(round(sum(col("v")), 2).as("filled_sum"),
          count(lit(1)).as("n_all"))
      val viewed = gf.dropna(Seq("v")).groupBy("user_id")
        .agg(count(lit(1)).as("n_view"))
      filled.join(viewed, Seq("user_id"), "left").toDF
        .select(col("user_id"), col("filled_sum"), col("n_all"),
          coalesce(col("n_view"), lit(0L)).as("n_view"))
        .orderBy("user_id")
    }),

    // SQL surface for the text-analysis operators: GraftExtensions
    // registers the SAME Column-composed TextOps expressions in the
    // function registry (one definition, two front doors — see
    // ColumnBridge), so `spark.sql` users get bit-identical token
    // counts / quality / fingerprints / language-ID.
    "f31_sql_text_fns" -> ((s, d) => {
      graft.Tables.registerAll(s, d)
      s.sql("""
        SELECT doc_id, graft_token_count(text) AS n_tokens,
          graft_quality(text) AS quality,
          graft_fingerprint(text) AS fp,
          graft_lang_id(text) AS pred_lang
        FROM documents ORDER BY doc_id""")
    }),

    // pandas df.corr(): the full pairwise Pearson triangle in ONE
    // partial+final aggregate pass (six co-moment aggregates, one scan).
    "f33_corr_matrix" -> ((s, d) => {
      GFrame.fromDF(Tables.lineitem(s, d), "l_orderkey")
        .corrMatrix(Seq("l_quantity", "l_extendedprice", "l_discount"))
        .toDF
        .select(col("c1"), col("c2"),
          graft.ops.TextOps.round6(col("corr")).as("corr"))
        .orderBy("c1", "c2")
    }),

    // Robust outlier screen: per-returnflag median/MAD and the count of
    // |x - med| > 3*1.4826*mad rows; med/mad snap to the 6dp grid
    // BEFORE the threshold so engine median-interpolation ulps can't
    // flip a count.
    "f47_robust_outliers" -> ((s, d) =>
      GFrame.fromDF(Tables.lineitem(s, d), "l_returnflag")
        .robustOutliers("l_returnflag", "l_extendedprice", k = 3.0)
        .toDF
        .select(col("l_returnflag"), col("n"), col("med"), col("mad"),
          col("n_outliers"))
        .orderBy("l_returnflag")),

    // Welch's unequal-variance t-test between every event_type pair —
    // the A/B readout. One bounded stats aggregate; pairing runs on the
    // |groups|-row frame only.
    "f48_welch_ttest" -> ((s, d) =>
      GFrame.fromDF(Tables.events(s, d), "event_id")
        .welchTTest("event_type", "value")
        .toDF.orderBy("g1", "g2")),

    // One-way ANOVA: does return flag explain quantity variance — the
    // k-sample completion of f48's pairwise Welch probes. Integral
    // quantities → exact BIGINT n/Σx/Σx² per group; per-group between-
    // terms snap to micro-unit longs so cross-group totals are order-
    // free; F closes as one fixed-association expression.
    "f62_anova" -> ((s, d) =>
      GFrame.fromDF(Tables.lineitem(s, d), "l_orderkey")
        .anovaF("l_returnflag", "l_quantity")
        .toDF.orderBy("g")),

    // TPC-H Q4 analog: orders per priority having AT LEAST ONE lineitem
    // shipped more than 30 days after the order date (the late-
    // fulfilment screen) — the EXISTS probe is ONE left-semi join on
    // the order key; counts close partial+final.
    // Month-over-month revenue growth per return flag: DECIMAL-exact
    // monthly sums rounded to 2dp doubles, then one keyed lag window
    // over the calendar-bounded frame; growth divides identical doubles
    // on both engines (null for each flag's first month).
    "f69_mom_growth" -> ((s, d) => {
      val rev = (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast("decimal(30,8)")
      val monthly = Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"),
          date_trunc("month", col("l_shipdate")).as("ship_month"))
        .agg(round(sum(rev), 2).cast("double").as("revenue"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("l_returnflag").orderBy("ship_month")
      monthly
        .withColumn("growth6", graft.ops.TextOps.round6(
          (col("revenue") - lag(col("revenue"), 1).over(w))
            / lag(col("revenue"), 1).over(w)))
        .select("l_returnflag", "ship_month", "revenue", "growth6")
        .orderBy("l_returnflag", "ship_month")
    }),

    // Rolling 20-row Pearson correlation (price vs quantity) per return
    // flag — EXACT window machinery: all five co-moment sums accumulate
    // as BIGINTs (integer cents × integer quantities) over one keyed
    // exchange ordered by the unique (l_orderkey, l_linenumber), so
    // every engine computes bit-identical sums; the closing correlation
    // is one fixed-association float expression. Null until the window
    // fills or a variance degenerates.
    "f70_rolling_corr" -> ((s, d) => {
      val xs = Tables.lineitem(s, d).select(
        col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
        floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("x"),
        floor(col("l_quantity") + 0.5).cast("long").as("y"))
      // (l_orderkey, l_linenumber) is NOT unique in the fixtures (~12k
      // duplicate pairs at sf0.01); adding the two measures makes the
      // sort total — fully tied rows are interchangeable for the window
      // sums anyway
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("l_returnflag")
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("x"), col("y"))
        .rowsBetween(-19, 0)
      val n = count(lit(1)).over(w)
      val sx = sum(col("x")).over(w); val sy = sum(col("y")).over(w)
      val sxy = sum(col("x") * col("y")).over(w)
      val sxx = sum(col("x") * col("x")).over(w)
      val syy = sum(col("y") * col("y")).over(w)
      val varX = (n * sxx - sx * sx).cast("double")
      val varY = (n * syy - sy * sy).cast("double")
      val cov = (n * sxy - sx * sy).cast("double")
      xs.select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
          when(n >= 20 && varX > 0 && varY > 0,
            graft.ops.TextOps.round6(cov / (sqrt(varX) * sqrt(varY))))
            .as("corr6"))
        .orderBy("l_returnflag", "l_orderkey", "l_linenumber")
    }),

    // TPC-H Q14 analog: monthly promo revenue share — the lineitem fact
    // streams once against the broadcast part dim; both revenue sums
    // accumulate in DECIMAL (per-row product in double, exact IEEE both
    // engines), and the share divides the two ROUNDED 2dp doubles, so
    // the closing ratio is bit-deterministic on the round6 floor grid.
    "f67_q14_promo" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .select("l_partkey", "l_shipdate", "l_extendedprice", "l_discount")
      val p = Tables.part(s, d).select("p_partkey", "p_type")
      val rev = (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast("decimal(30,8)")
      li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .groupBy(date_trunc("month", col("l_shipdate")).as("ship_month"))
        .agg(
          round(sum(when(col("p_type") === "PROMO", rev)
            .otherwise(lit(0).cast("decimal(30,8)"))), 2)
            .cast("double").as("promo_rev"),
          round(sum(rev), 2).cast("double").as("total_rev"))
        .withColumn("promo_share6", graft.ops.TextOps.round6(
          col("promo_rev") / col("total_rev")))
        .orderBy("ship_month")
    }),

    "f66_q4_late" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
      val li = Tables.lineitem(s, d).select("l_orderkey", "l_shipdate")
      val late = li.join(o.select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .filter(datediff(col("l_shipdate"), col("o_orderdate")) > 30)
        .select(col("l_orderkey").as("k"))
      o.join(late, col("o_orderkey") === col("k"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    }),

    // TPC-H Q7 analog: bilateral trade volume between supplier and
    // customer nations per order year (supp_nation ≠ cust_nation) —
    // the two-dimension star probe. The lineitem fact streams once
    // through four broadcast dims; revenue = discounted extended price
    // through DECIMAL.
    "f65_q7_volume" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .select("l_orderkey", "l_suppkey", "l_extendedprice",
          "l_discount")
      val o = Tables.orders(s, d).select("o_orderkey", "o_custkey",
        "o_orderdate")
      val c = Tables.customer(s, d).select("c_custkey", "c_nationkey")
      val su = Tables.supplier(s, d).select("s_suppkey", "s_nationkey")
      val n = Tables.nation(s, d).select("n_nationkey", "n_name")
      li.join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n.select(col("n_nationkey").as("sk"),
          col("n_name").as("supp_nation"))),
          col("s_nationkey") === col("sk"))
        .join(broadcast(n.select(col("n_nationkey").as("ck"),
          col("n_name").as("cust_nation"))),
          col("c_nationkey") === col("ck"))
        .filter(col("supp_nation") =!= col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("o_orderdate")).as("l_year"))
        .agg(graft.ops.TextOps.round2(
          sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast("decimal(30,8)")).cast("double")).as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    }),

    // Hierarchical share-of-parent: each nation's customer-order
    // revenue as a share of its region and each region's share of the
    // world — the drill-down ratio report every rollup UI renders. Fact
    // stream × two broadcast dims; money sums exact through DECIMAL,
    // shares are ratios of those exact sums; parent totals come from
    // re-aggregating the |nations| frame (no window, no second scan).
    "f64_share_of_parent" -> ((s, d) => {
      val o = Tables.orders(s, d).select("o_custkey", "o_totalprice")
      val c = Tables.customer(s, d).select("c_custkey", "c_nationkey")
      val n = Tables.nation(s, d).select("n_nationkey", "n_name",
        "n_regionkey")
      val r = Tables.region(s, d).select("r_regionkey", "r_name")
      val byNation = o
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name").as("region"), col("n_name").as("nation"))
        .agg(sum(col("o_totalprice").cast("decimal(30,8)")).as("rev"))
      val byNationP = graft.Caches.track(byNation
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      val byRegion = byNationP.groupBy("region")
        .agg(sum(col("rev")).as("rrev"))
      val wrev = byNationP.agg(sum(col("rev"))).head() // 1-row world total
        .getDecimal(0)
      byNationP.join(byRegion, "region")
        .select(col("region"), col("nation"),
          graft.ops.TextOps.round2(col("rev").cast("double")).as("rev2"),
          graft.ops.TextOps.round6(col("rev").cast("double")
            / col("rrev").cast("double")).as("nation_share6"),
          graft.ops.TextOps.round6(col("rrev").cast("double")
            / lit(wrev).cast("double")).as("region_share6"))
        .orderBy("region", "nation")
    }),

    // Market-basket association rules over order baskets: both
    // directions of every part pair co-purchased in ≥2 orders, with
    // exact-integer support/confidence/lift — the per-basket self-join
    // fans out basket-size-bounded, never all-pairs across baskets.
    "f63_assoc_rules" -> ((s, d) =>
      graft.ops.BasketOps.associationRules(Tables.lineitem(s, d),
          "l_orderkey", "l_partkey", minPairs = 2L)
        .orderBy("ante", "cons")),

    // Benford first-digit conformity screen over order prices (as exact
    // cents): per-digit observed vs PINNED expected proportions + the
    // closing MAD statistic — 9-digit keyed count, everything else
    // 9-row arithmetic.
    "f61_benford" -> ((s, d) =>
      graft.ops.EvalOps.benford(Tables.orders(s, d),
          floor(col("o_totalprice") * 100 + 0.5).cast("long"))
        .orderBy("digit")),

    // Two-sample Kolmogorov–Smirnov drift test between order-price
    // distributions of two customer segments: EXACT — D's numerator is
    // the max INTEGER |c1·n2 − c2·n1| over distinct cents (distributed
    // range-bucket cumsum, never a single-task window), one closing
    // division. Ties at the max break to the smallest value.
    "f60_ks_test" -> ((s, d) => {
      def seg(name: String) = Tables.orders(s, d)
        .join(Tables.customer(s, d).filter(col("c_mktsegment") === name),
          col("o_custkey") === col("c_custkey"))
        .select(floor(col("o_totalprice") * 100 + 0.5).cast("long")
          .as("cents"))
      graft.ops.EvalOps.ksTest(seg("BUILDING"), seg("MACHINERY"), "cents")
    }),

    // Pareto 80/20 contribution report over customer revenue: shares +
    // tie-totalized cumulative shares through the distributed
    // per-distinct-cent cumsum (never a single-task global window), and
    // the vital-few flag.
    "f59_pareto" -> ((s, d) => {
      val cust = Tables.orders(s, d)
        .select(col("o_custkey"),
          floor(col("o_totalprice") * 100 + 0.5).cast("long").as("__cc"))
        .groupBy("o_custkey").agg(sum(col("__cc")).as("__sc"))
        .select(col("o_custkey"),
          (col("__sc").cast("double") / lit(100.0)).as("revenue"))
      GFrame.fromDF(cust, "o_custkey").pareto("revenue", threshold = 0.8)
        .toDF.orderBy("o_custkey")
    }),

    // Incremental view maintenance: per-key (count/sum/min/max) STATES
    // built on two halves merge with one keyed reduce and must equal
    // the full-data aggregate — the maintained-view-never-re-reads-
    // history contract, proven against the all-rows oracle.
    "f58_incr_agg" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val a = GFrame.fromDF(
        li.filter(pmod(col("l_orderkey"), lit(2)) === 0), "l_returnflag")
        .aggState("l_quantity")
      val b = GFrame.fromDF(
        li.filter(pmod(col("l_orderkey"), lit(2)) =!= 0), "l_returnflag")
        .aggState("l_quantity")
      a.mergeAggStates(b).toDF.orderBy("l_returnflag")
    }),

    // Population Stability Index of the order-value distribution, pre-
    // vs post-1998 snapshots binned at 50k — the corpus/feature drift
    // monitor (two bounded bin aggregates + a full outer join; exact-
    // integer ln() arguments, µ-unit BIGINT total: the f55 discipline).
    "f57_psi" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val cut = lit("1998-01-01 00:00:00").cast("timestamp")
      graft.ops.EvalOps.psi(
          o.filter(col("o_orderdate") < cut),
          o.filter(col("o_orderdate") >= cut),
          floor(col("o_totalprice") / 50000).cast("long"))
        .orderBy("bin")
    }),

    // Gini concentration of order value per priority class: one keyed
    // rank window + one aggregate; exact integer-cent sums make the
    // coefficient bit-deterministic.
    "f56_gini" -> ((s, d) =>
      GFrame.fromDF(Tables.orders(s, d), "o_orderkey")
        .giniBy("o_orderpriority", "o_totalprice", "o_orderkey")
        .toDF.orderBy("g")),

    // Weight-of-Evidence / Information Value of quantity deciles vs the
    // returned flag: one bounded bin aggregate, exact-integer ln()
    // argument, IV as an order-free micro-unit BIGINT total (the e37
    // discipline for the classic supervised-binning diagnostic).
    "f55_woe_iv" -> ((s, d) =>
      graft.ops.EventOps.woeIv(
        Tables.lineitem(s, d)
          .withColumn("qbin", floor(col("l_quantity") / 10).cast("long")),
        "qbin", col("l_returnflag") === "R")
        .orderBy("bin")),

    // CDC batch applied to a snapshot (warehouse MERGE): deletes drop,
    // updates replace, inserts add — ONE anti-join + ONE union; the
    // change batch is synthesized deterministically from the snapshot.
    "f54_cdc_apply" -> ((s, d) => {
      val snap = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_acctbal"), col("c_nationkey"))
      val changes = snap
        .filter(pmod(col("c_custkey"), lit(10)) === 0)
        .withColumn("op", lit("D"))
        .unionByName(snap.filter(pmod(col("c_custkey"), lit(10)) === 1)
          .withColumn("c_acctbal", col("c_acctbal") + 100.0)
          .withColumn("op", lit("U")))
        .unionByName(snap.filter(pmod(col("c_custkey"), lit(10)) === 2)
          .withColumn("c_custkey", col("c_custkey") + 1000000L)
          .withColumn("op", lit("I")))
      GFrame.fromDF(snap, "c_custkey")
        .applyChanges(changes, "c_custkey", "op")
        .toDF.orderBy("c_custkey")
    }),

    // Data-quality expectations over the star schema: fused row rules
    // (ONE scan for all predicates), key uniqueness, and two referential
    // checks via anti-joins against distinct parent keys — each closing
    // to a bounded 1-row probe. The discount rule intentionally FAILS
    // (violations > 0) so the report shape carries both outcomes.
    "f52_expectations" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      graft.ops.ValidateOps.report(li,
        rowRules = Seq(
          "l_quantity_range" -> !col("l_quantity").between(1, 50),
          "l_discount_le_5pct" -> (col("l_discount") > 0.05),
          "l_shipdate_not_null" -> col("l_shipdate").isNull),
        uniqueRules = Seq(
          "li_line_unique" -> Seq("l_orderkey", "l_linenumber")),
        fkRules = Seq(
          ("li_order_fk", li, "l_orderkey", Tables.orders(s, d),
            "o_orderkey"),
          ("orders_cust_fk", Tables.orders(s, d), "o_custkey",
            Tables.customer(s, d), "c_custkey")))
    }),

    // Hot-key diagnostic for a join key: top-20 heaviest keys with share
    // and skew factor (multiples of the mean per-key load — what AQE
    // thresholds and salting factors are sized from).
    "f53_skew_report" -> ((s, d) =>
      graft.ops.SkewOps.skewReport(Tables.lineitem(s, d), "l_suppkey",
        topN = 20)),

    // Mann–Whitney U rank-sum (A vs R return flags on quantity): the
    // nonparametric sibling of f48 — per-distinct-value counts + the
    // range-bucket distributed cumsum, never a row-level rank.
    "f51_mannwhitney" -> ((s, d) =>
      GFrame.fromDF(Tables.lineitem(s, d), "l_orderkey")
        .mannWhitney("l_returnflag", "l_quantity", "A", "R")
        .toDF.orderBy("n1")),

    // 2-D Pareto frontier (min price, max size) via the distributed
    // exclusive-prefix-max plan — never a single-task global window.
    "f49_skyline" -> ((s, d) =>
      GFrame.fromDF(Tables.part(s, d), "p_partkey")
        .skyline("p_retailprice", "p_size")
        .toDF.orderBy("x")),

    // Weighted median: first price at which running l_quantity reaches
    // half the group total — one keyed exchange carries both windows.
    "f50_weighted_median" -> ((s, d) =>
      GFrame.fromDF(Tables.lineitem(s, d), "l_returnflag")
        .weightedQuantile("l_returnflag", "l_extendedprice", "l_quantity",
          q = 0.5, tieCols = Seq("l_orderkey", "l_linenumber"))
        .toDF.orderBy("l_returnflag")),

    // pandas df.corrwith(other): per-column Pearson corr against the
    // keyed-aligned twin frame — one join + ONE aggregate for all
    // columns; the nat pair is exactly anti-correlated (corr −1).
    "f44_corrwith" -> ((s, d) => {
      val base = Tables.customer(s, d)
      val left = GFrame.fromDF(base.select(col("c_custkey"),
        col("c_acctbal").as("bal"),
        col("c_nationkey").cast("double").as("nat")), "c_custkey")
      val right = GFrame.fromDF(base.select(col("c_custkey"),
        (col("c_acctbal") * 0.5 + col("c_custkey") % 100).as("bal"),
        (lit(25) - col("c_nationkey")).cast("double").as("nat")),
        "c_custkey")
      left.corrwith(right, on = Seq("c_custkey"), cols = Seq("bal", "nat"))
        .toDF
        .select(col("colname"),
          graft.ops.TextOps.round6(col("corr")).as("corr"))
        .orderBy("colname")
    }),

    // pandas df.compare(other): keyed align + null-safe cell diff; the
    // "other" frame is a deterministic perturbation of customer (acctbal
    // bumped on custkey%10, mktsegment rewritten on custkey%13) derived
    // identically on both engine sides.
    "f43_compare" -> ((s, d) => {
      val base = Tables.customer(s, d)
        .select("c_custkey", "c_acctbal", "c_mktsegment")
      val left = GFrame.fromDF(base, "c_custkey")
      val right = GFrame.fromDF(base
        .withColumn("c_acctbal",
          when(pmod(col("c_custkey"), lit(10)) === 0,
            col("c_acctbal") + 10.0).otherwise(col("c_acctbal")))
        .withColumn("c_mktsegment",
          when(pmod(col("c_custkey"), lit(13)) === 0, lit("ALTERED"))
            .otherwise(col("c_mktsegment"))), "c_custkey")
      left.compare(right, on = Seq("c_custkey"),
          cols = Seq("c_acctbal", "c_mktsegment")).toDF
        .orderBy("c_custkey")
    }),

    // pandas df.nlargest(n, columns): TakeOrderedAndProject — per-
    // partition top-n heaps, no global sort.
    "f42_nlargest" -> ((s, d) =>
      GFrame.fromDF(Tables.orders(s, d), "o_orderkey")
        .nlargest(15, Seq("o_totalprice"), Seq(col("o_orderkey").asc))
        .toDF.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))),

    // pandas merge(on=, how='left', suffixes=, validate='m:1'): collision
    // suffixing + cardinality assertion (one bounded max-count aggregate
    // on the claimed-unique side).
    "f41_merge_validate" -> ((s, d) => {
      val cust = GFrame.fromDF(Tables.customer(s, d)
        .select(col("c_custkey"), col("c_nationkey").as("nk"),
          col("c_name").as("name")), "c_custkey")
      val nat = GFrame.fromDF(Tables.nation(s, d)
        .select(col("n_nationkey").as("nk"), col("n_name").as("name")),
        "nk")
      cust.merge(nat, on = Seq("nk"), how = "left",
          validate = Some("m:1")).toDF
        .orderBy("c_custkey")
    }),

    // pandas df.cov(): all pairwise sample covariances in ONE
    // partial+final pass (small-magnitude columns so the co-moment drift
    // between engines stays far inside the 1e-6 rounding grid).
    "f40_cov_matrix" -> ((s, d) => {
      GFrame.fromDF(Tables.lineitem(s, d), "l_orderkey")
        .covMatrix(Seq("l_quantity", "l_discount", "l_tax"))
        .toDF
        .select(col("c1"), col("c2"),
          graft.ops.TextOps.round6(col("cov")).as("cov"))
        .orderBy("c1", "c2")
    }),

    // pandas pivot_table(aggfunc=['sum','mean'], margins=True): multi-agg
    // pivot + All row/column, every margin recomputed from raw rows (a
    // mean of means is wrong). Integer quantities make the parallel sums
    // exact, so floor-round6 sees identical doubles in both engines.
    // Per-group OLS (pandas groupby().apply(linregress) closed-form):
    // totalprice ~ orderdate-day per order priority — one partial+final
    // aggregation of six sums, the regression closes from the sums.
    // Scaled/centered inputs keep the co-moment cancellation far inside
    // round6; the oracle spells the IDENTICAL sum algebra (not DuckDB's
    // regr_*, whose internal Welford updates would drift differently).
    "f35_group_linfit" -> ((s, d) =>
      GFrame.fromDF(Tables.orders(s, d), "o_orderkey")
        .linFitBy(Seq("o_orderpriority"),
          (unix_date(col("o_orderdate").cast("date")).cast("double")
            - lit(10000.0)) / lit(1000.0),
          col("o_totalprice") / lit(100000.0))
        .toDF
        .select(col("o_orderpriority"), col("n"),
          graft.ops.TextOps.round6(col("slope")).as("slope"),
          graft.ops.TextOps.round6(col("intercept")).as("intercept"),
          graft.ops.TextOps.round6(col("r2")).as("r2"))
        .orderBy("o_orderpriority")),

    "f34_pivot_table" -> ((s, d) =>
      li(s, d).pivotTable("l_linestatus", "l_returnflag",
          Seq("A", "N", "R"),
          Seq(graft.ops.TextOps.round6(sum(col("l_quantity"))).as("sq"),
            graft.ops.TextOps.round6(avg(col("l_quantity"))).as("aq")),
          margins = true)
        .toDF.orderBy("l_linestatus")),

    // pandas groupby(orderkey).filter(len >= 6): every lineitem row of
    // the orders with at least 6 lines — HAVING that keeps member rows.
    // One unordered keyed window (no sort, no agg-then-self-join).
    "f38_group_filter" -> ((s, d) =>
      GFrame.fromDF(Tables.lineitem(s, d), "l_orderkey")
        .groupFilter(Seq(col("l_orderkey")), count(lit(1)), _ >= 6)
        .toDF
        .select(col("l_orderkey"), col("l_linenumber"),
          round(col("l_quantity"), 2).as("qty"))
        .orderBy("l_orderkey", "l_linenumber")),

    // pandas df.drop_duplicates(subset=['cust', 'priority']): one
    // DETERMINISTIC survivor (smallest orderkey) per subset key — one
    // unordered keyed window flag, single shuffle, no sort (Spark's
    // native dropDuplicates picks an arbitrary row).
    "f37_drop_dup_subset" -> ((s, d) =>
      GFrame.fromDF(Tables.orders(s, d), "o_orderkey")
        .dropDuplicatesBy(Seq(col("o_custkey"), col("o_orderpriority")))
        .toDF
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"))
        .orderBy("o_orderkey")),

    // pandas groupby(custkey).head(2): each customer's first two orders
    // by (orderdate, orderkey). The rank predicate sits directly on the
    // staged row_number → WindowGroupLimit per-partition top-n heaps
    // BEFORE the shuffle (plan-asserted in GFrameSpec).
    "f36_group_head" -> ((s, d) =>
      GFrame.fromDF(Tables.orders(s, d), "o_orderkey")
        .groupHead(Seq(col("o_custkey")),
          Seq(col("o_orderdate").asc, col("o_orderkey").asc), 2)
        .toDF
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
          col("o_totalprice"))
        .orderBy("o_orderkey")),

    // pandas get_dummies (one-hot over the five TPC-H market segments):
    // a pure projection — per-value indicator columns, no shuffle, no
    // category-discovery job.
    "f32_get_dummies" -> ((s, d) => {
      GFrame.fromDF(Tables.customer(s, d)
          .select(col("c_custkey").as("custkey"), col("c_mktsegment")),
          "custkey")
        .getDummies("c_mktsegment",
          Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
            "MACHINERY"), prefix = "mkt")
        .toDF.drop("c_mktsegment").orderBy("custkey")
    }),

    // pandas merge(how='outer', indicator=True): customers full-outer
    // per-customer order counts, _merge records provenance (customers
    // with no orders -> left_only). One keyed exchange.
    "f30_merge_indicator" -> ((s, d) => {
      val l = GFrame.fromDF(Tables.customer(s, d)
        .select(col("c_custkey").as("custkey"), col("c_mktsegment")),
        "custkey")
      val r = GFrame.fromDF(Tables.orders(s, d)
        .groupBy(col("o_custkey").as("custkey"))
        .agg(count(lit(1)).as("n_orders")), "custkey")
      l.mergeIndicator(r, Seq("custkey")).toDF.orderBy("custkey")
    }),

    // Per-group EXACT distinct counts — the exact sibling of f21's HLL
    // sketches (the 100 TB default is f21; this is the small-group /
    // audit path). count_distinct shuffles the distinct (group, value)
    // pairs — partial dedup map-side first.
    "f28_group_nunique" -> ((s, d) =>
      GFrame.fromDF(Tables.orders(s, d), "o_orderkey")
        .groupBy("o_orderpriority")
        .agg(count_distinct(col("o_custkey")).as("nd_cust"),
          count_distinct(col("o_orderstatus")).as("nd_status"),
          count(lit(1)).as("n"))
        .sortValues(col("o_orderpriority")).toDF),

    // Relative-position windows (pandas rank(pct=True) + qcut-by-rank):
    // percent_rank / cume_dist / ntile(4) of order totals within each
    // priority class — all three from ONE keyed window (one shuffle,
    // per-partition sort; ordering tie-broken on the key for determinism).
    "f29_window_pct" -> ((s, d) =>
      GFrame.fromDF(Tables.orders(s, d)
          .filter(col("o_orderkey") <= 20000)
          .select("o_orderkey", "o_orderpriority", "o_totalprice"),
          "o_orderkey")
        .withPctWindows(Seq(col("o_orderpriority")),
          Seq(col("o_totalprice"), col("o_orderkey")), ntiles = 4)
        .toDF
        .select(col("o_orderkey"), col("o_orderpriority"),
          round(col("pct_rank"), 6).as("pct_rank"),
          round(col("cume_dist"), 6).as("cume_dist"), col("tile"))
        .orderBy("o_orderkey")),

    // Bucket-pruned co-located join — the 100 TB layout flagship: both
    // facts are WRITTEN bucketed+sorted on the join key (8 buckets), so
    // the read-back SortMergeJoin consumes the on-disk clustering and
    // the per-order aggregate reuses the same distribution — ZERO shuffle
    // exchanges below the final presentation sort (asserted in
    // GFrameSpec's plan lint). This is f20's sink gate upgraded from
    // partition pruning to join co-location.
    "f27_bucketed_join" -> ((s, d) => {
      graft.sources.Sources.writeBucketed(
        Tables.orders(s, d).select("o_orderkey", "o_totalprice"),
        "graft_f27_orders", "o_orderkey", buckets = 8)
      graft.sources.Sources.writeBucketed(
        Tables.lineitem(s, d).select("l_orderkey", "l_quantity"),
        "graft_f27_lineitem", "l_orderkey", buckets = 8)
      val o = GFrame.fromDF(s.table("graft_f27_orders"), "o_orderkey")
      val li = GFrame.fromDF(s.table("graft_f27_lineitem"), "l_orderkey")
      o.joinSortMerge(li, col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderkey")
        .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
          count(lit(1)).as("n"))
        .sortValues(col("o_orderkey")).toDF
    })
  )

  val oracles: Map[String, String] = Map(
    "f25_crosstab" ->
      """SELECT c_nationkey,
           count(*) FILTER (c_mktsegment = 'AUTOMOBILE') AS AUTOMOBILE,
           count(*) FILTER (c_mktsegment = 'BUILDING') AS BUILDING,
           count(*) FILTER (c_mktsegment = 'FURNITURE') AS FURNITURE,
           count(*) FILTER (c_mktsegment = 'HOUSEHOLD') AS HOUSEHOLD,
           count(*) FILTER (c_mktsegment = 'MACHINERY') AS MACHINERY
         FROM customer GROUP BY 1 ORDER BY 1""",
    "f26_na_handling" ->
      """SELECT user_id,
           round(sum(coalesce(CASE WHEN event_type = 'view' THEN value END,
             -1.0)), 2) AS filled_sum,
           count(*) AS n_all,
           count(CASE WHEN event_type = 'view' THEN value END) AS n_view
         FROM events GROUP BY 1 ORDER BY 1""",
    "f27_bucketed_join" ->
      """SELECT o_orderkey, round(sum(l_quantity), 2) AS sum_qty,
           count(*) AS n
         FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         GROUP BY 1 ORDER BY 1""",
    // formulas mirror t02 (quality) / t05 (lang-ID) / t06 (fingerprint)
    "f31_sql_text_fns" ->
      """WITH t AS (SELECT doc_id, text,
             list_filter(string_split(lower(text), ' '), x -> x <> '') AS ts
           FROM documents),
         sc AS (SELECT doc_id,
             len(list_filter(ts, x -> x IN ('the','and','of','is'))) AS en,
             len(list_filter(ts, x -> x IN ('el','la','los','de','que'))) AS es,
             len(list_filter(ts, x -> x IN ('der','die','und','das','ist'))) AS de,
             len(list_filter(ts, x -> x IN ('le','les','et','est','une'))) AS fr
           FROM t)
         SELECT t.doc_id, CAST(len(ts) AS INTEGER) AS n_tokens,
           floor(least(length(text) / 500.0, 1.0) * greatest(0.0,
             1.0 - (CASE WHEN len(ts) = 0 THEN 0.0 ELSE
               len(list_filter(ts, x -> x IN ('the','a','an','of','and','to',
                 'in','is','on','for','with'))) * 1.0 / len(ts) END) * 2.0)
             * 1e6 + 0.5) / 1e6 AS quality,
           md5(regexp_replace(trim(lower(text)), ' +', ' ', 'g')) AS fp,
           CASE WHEN en >= es AND en >= de AND en >= fr THEN 'en'
             WHEN es >= de AND es >= fr THEN 'es'
             WHEN de >= fr THEN 'de' ELSE 'fr' END AS pred_lang
         FROM t JOIN sc ON t.doc_id = sc.doc_id
         ORDER BY t.doc_id""",
    // f34: FILTER-agg spelling of the same cells; empty cells are NULL in
    // both engines (sum/avg FILTER over no rows, Spark pivot over no rows)
    // f35: identical six-sum closed-form algebra as the Spark side —
    // regr_slope & co would use different incremental updates.
    "f35_group_linfit" ->
      """WITH b AS (SELECT o_orderpriority,
             (CAST(datediff('day', DATE '1970-01-01',
               CAST(o_orderdate AS DATE)) AS DOUBLE) - 10000.0)
               / 1000.0 AS x,
             o_totalprice / 100000.0 AS y
           FROM orders),
         a AS (SELECT o_orderpriority, count(*) AS n,
             sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
             sum(x * x) AS sx2, sum(y * y) AS sy2
           FROM b GROUP BY 1)
         SELECT o_orderpriority, n,
           floor((n * sxy - sx * sy) / (n * sx2 - sx * sx) * 1e6 + 0.5)
             / 1e6 AS slope,
           floor(((sy - (n * sxy - sx * sy) / (n * sx2 - sx * sx) * sx)
             / n) * 1e6 + 0.5) / 1e6 AS intercept,
           floor(((n * sxy - sx * sy) * (n * sxy - sx * sy))
             / ((n * sx2 - sx * sx) * (n * sy2 - sy * sy)) * 1e6 + 0.5)
             / 1e6 AS r2
         FROM a ORDER BY o_orderpriority""",

    "f38_group_filter" ->
      """SELECT l_orderkey, l_linenumber, round(l_quantity, 2) AS qty
         FROM lineitem
         QUALIFY count(*) OVER (PARTITION BY l_orderkey) >= 6
         ORDER BY l_orderkey, l_linenumber""",

    "f39_zorder_roundtrip" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
           round(l_quantity, 2) AS qty
         FROM lineitem
         WHERE l_partkey BETWEEN 100 AND 300
           AND l_suppkey BETWEEN 10 AND 60
         ORDER BY l_orderkey, l_linenumber""",

    "f37_drop_dup_subset" ->
      """SELECT o_orderkey, o_custkey, o_orderpriority
         FROM orders
         QUALIFY o_orderkey = min(o_orderkey) OVER (
           PARTITION BY o_custkey, o_orderpriority)
         ORDER BY o_orderkey""",

    "f36_group_head" ->
      """SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice
         FROM orders
         QUALIFY row_number() OVER (PARTITION BY o_custkey
           ORDER BY o_orderdate, o_orderkey) <= 2
         ORDER BY o_orderkey""",

    "f34_pivot_table" ->
      """WITH c AS (
           SELECT CAST(l_linestatus AS VARCHAR) AS l_linestatus,
             floor(sum(l_quantity) FILTER (l_returnflag = 'A') * 1e6 + 0.5)
               / 1e6 AS A_sq,
             floor(avg(l_quantity) FILTER (l_returnflag = 'A') * 1e6 + 0.5)
               / 1e6 AS A_aq,
             floor(sum(l_quantity) FILTER (l_returnflag = 'N') * 1e6 + 0.5)
               / 1e6 AS N_sq,
             floor(avg(l_quantity) FILTER (l_returnflag = 'N') * 1e6 + 0.5)
               / 1e6 AS N_aq,
             floor(sum(l_quantity) FILTER (l_returnflag = 'R') * 1e6 + 0.5)
               / 1e6 AS R_sq,
             floor(avg(l_quantity) FILTER (l_returnflag = 'R') * 1e6 + 0.5)
               / 1e6 AS R_aq,
             floor(sum(l_quantity) * 1e6 + 0.5) / 1e6 AS All_sq,
             floor(avg(l_quantity) * 1e6 + 0.5) / 1e6 AS All_aq
           FROM lineitem GROUP BY 1
           UNION ALL
           SELECT 'All',
             floor(sum(l_quantity) FILTER (l_returnflag = 'A') * 1e6 + 0.5)
               / 1e6,
             floor(avg(l_quantity) FILTER (l_returnflag = 'A') * 1e6 + 0.5)
               / 1e6,
             floor(sum(l_quantity) FILTER (l_returnflag = 'N') * 1e6 + 0.5)
               / 1e6,
             floor(avg(l_quantity) FILTER (l_returnflag = 'N') * 1e6 + 0.5)
               / 1e6,
             floor(sum(l_quantity) FILTER (l_returnflag = 'R') * 1e6 + 0.5)
               / 1e6,
             floor(avg(l_quantity) FILTER (l_returnflag = 'R') * 1e6 + 0.5)
               / 1e6,
             floor(sum(l_quantity) * 1e6 + 0.5) / 1e6,
             floor(avg(l_quantity) * 1e6 + 0.5) / 1e6
           FROM lineitem)
         SELECT * FROM c ORDER BY l_linestatus""",
    "f33_corr_matrix" ->
      """WITH p AS (
           SELECT 'l_quantity' AS c1, 'l_quantity' AS c2,
             corr(l_quantity, l_quantity) AS corr FROM lineitem
           UNION ALL SELECT 'l_quantity', 'l_extendedprice',
             corr(l_quantity, l_extendedprice) FROM lineitem
           UNION ALL SELECT 'l_quantity', 'l_discount',
             corr(l_quantity, l_discount) FROM lineitem
           UNION ALL SELECT 'l_extendedprice', 'l_extendedprice',
             corr(l_extendedprice, l_extendedprice) FROM lineitem
           UNION ALL SELECT 'l_extendedprice', 'l_discount',
             corr(l_extendedprice, l_discount) FROM lineitem
           UNION ALL SELECT 'l_discount', 'l_discount',
             corr(l_discount, l_discount) FROM lineitem)
         SELECT c1, c2, floor(corr * 1e6 + 0.5) / 1e6 AS corr
         FROM p ORDER BY c1, c2""",
    "f42_nlargest" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 15""",
    "f45_q10_sql" -> Q10Sql,
    "f68_grouping_sets" -> GroupingSetsSql,
    "f79_correlated_subquery" -> CorrelatedSql,
    "f71_filter_agg" -> FilterAggSql,
    "f73_window_sql" -> WindowParitySql,
    "f48_welch_ttest" ->
      """WITH st AS (SELECT event_type AS g, count(value) AS n,
             avg(value) AS mu, var_samp(value) AS s2
           FROM events GROUP BY 1 HAVING count(value) >= 2)
         SELECT a.g AS g1, b.g AS g2, a.n AS n1, b.n AS n2,
           floor(((a.mu - b.mu) / sqrt(a.s2/a.n + b.s2/b.n)) * 1e6 + 0.5)
             / 1e6 AS t6,
           floor(((a.s2/a.n + b.s2/b.n) * (a.s2/a.n + b.s2/b.n)
               / ((a.s2/a.n) * (a.s2/a.n) / (a.n - 1)
                  + (b.s2/b.n) * (b.s2/b.n) / (b.n - 1))) * 1e6 + 0.5)
             / 1e6 AS df6
         FROM st a JOIN st b ON a.g < b.g ORDER BY g1, g2""",
    // f66: the EXISTS probe as a semi-join; date_diff day boundaries
    // match Spark's datediff on DATE columns.
    // f72: the compacted scan must carry the source values bit-exactly.
    // f75: digits off exact integer cents; expected shares are the SAME
    // pinned literals; contributions one shared formula spelling.
    "f75_benford" ->
      """WITH c AS (SELECT CAST(substr(CAST(CAST(floor(o_totalprice * 100
               + 0.5) AS BIGINT) AS VARCHAR), 1, 1) AS INTEGER) AS digit
           FROM orders),
         cnt AS (SELECT digit, CAST(count(*) AS BIGINT) AS n
           FROM c GROUP BY 1),
         t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM cnt),
         p AS (SELECT digit, CAST(expected6 AS DOUBLE) AS expected6
           FROM (VALUES (1, 0.301030), (2, 0.176091), (3, 0.124939),
             (4, 0.096910), (5, 0.079181), (6, 0.066947), (7, 0.057992),
             (8, 0.051153), (9, 0.045757)) v(digit, expected6))
         SELECT cnt.digit, n,
           floor(n * 1.0 / total * 1e6 + 0.5) / 1e6 AS share6,
           expected6,
           floor((n - total * expected6) * (n - total * expected6)
             / (total * expected6) * 1e6 + 0.5) / 1e6 AS contrib6
         FROM cnt CROSS JOIN t JOIN p ON cnt.digit = p.digit
         ORDER BY cnt.digit""",
    // f76: the same two quantile_cont passes + one literal-product
    // threshold; med/mad raw doubles (interpolation parity precedent).
    "f76_mad_outliers" ->
      """WITH med AS (SELECT c_nationkey,
             quantile_cont(c_acctbal, 0.5) AS med
           FROM customer GROUP BY 1),
         dev AS (SELECT c.c_nationkey, m.med,
             abs(c_acctbal - m.med) AS dev
           FROM customer c JOIN med m USING (c_nationkey)),
         st AS (SELECT c_nationkey, quantile_cont(dev, 0.5) AS mad
           FROM dev GROUP BY 1)
         SELECT d.c_nationkey, CAST(count(*) AS BIGINT) AS n,
           max(d.med) AS med, max(s.mad) AS mad,
           CAST(sum(CASE WHEN d.dev > 4.4478 * s.mad THEN 1 ELSE 0 END)
             AS BIGINT) AS n_outliers
         FROM dev d JOIN st s USING (c_nationkey)
         GROUP BY 1 ORDER BY 1""",
    // f74: the two generations recreated relationally; the merged-scan
    // union is exactly this projection (count keeps every row, chars
    // sum only over gen1's).
    "f74_schema_evolution" ->
      """WITH m AS (
           SELECT doc_id,
             CASE WHEN doc_id % 2 = 0 THEN length(text) END AS n_chars,
             CASE WHEN doc_id % 2 <> 0 THEN lang END AS lang
           FROM documents)
         SELECT COALESCE(lang, 'none') AS lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(COALESCE(sum(n_chars), 0) AS BIGINT) AS sum_chars
         FROM m GROUP BY 1 ORDER BY 1""",
    "f72_compact" ->
      """SELECT doc_id, md5(text) AS fp FROM documents ORDER BY doc_id""",
    // f77: the healthy 500 must hash-match the fixture; the 3 poisoned
    // lines are gate-spliced constants, so the oracle enumerates them
    // verbatim as the quarantine side.
    "f77_bad_records" ->
      """SELECT doc_id, source, md5(text) AS fp,
           CAST(NULL AS VARCHAR) AS raw, FALSE AS quarantined
         FROM documents
         UNION ALL
         SELECT NULL, NULL, NULL, raw, TRUE FROM (VALUES
           ('xx,src0,doc id fails the bigint cast'),
           ('7,"src1,unterminated quote never closes'),
           ('8,src2,token count,overflows,the,schema')) t(raw)
         ORDER BY quarantined, doc_id, raw""",
    // f69: the same DECIMAL monthly sums; growth divides identical 2dp
    // doubles, so the 6dp floor grid is drift-free.
    "f69_mom_growth" ->
      """WITH m AS (SELECT l_returnflag,
           date_trunc('month', l_shipdate) AS ship_month,
           CAST(round(sum(CAST(l_extendedprice * (1.0 - l_discount)
             AS DECIMAL(30,8))), 2) AS DOUBLE) AS revenue
         FROM lineitem GROUP BY 1, 2),
         g AS (SELECT l_returnflag, ship_month, revenue,
             lag(revenue) OVER (PARTITION BY l_returnflag
               ORDER BY ship_month) AS prev
           FROM m)
         SELECT l_returnflag, ship_month, revenue,
           floor((revenue - prev) / prev * 1e6 + 0.5) / 1e6 AS growth6
         FROM g ORDER BY l_returnflag, ship_month""",
    // f70: identical BIGINT co-moment window sums (DuckDB widens to
    // HUGEINT — only compared/cast, never returned), one closing float
    // expression in the same association.
    "f70_rolling_corr" ->
      """WITH t AS (SELECT l_returnflag, l_orderkey, l_linenumber,
           CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS x,
           CAST(floor(l_quantity + 0.5) AS BIGINT) AS y
         FROM lineitem),
         s AS (SELECT l_returnflag, l_orderkey, l_linenumber,
             count(*) OVER w AS n,
             sum(x) OVER w AS sx, sum(y) OVER w AS sy,
             sum(x * y) OVER w AS sxy, sum(x * x) OVER w AS sxx,
             sum(y * y) OVER w AS syy
           FROM t WINDOW w AS (PARTITION BY l_returnflag
             ORDER BY l_orderkey, l_linenumber, x, y
             ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
         SELECT l_returnflag, l_orderkey, l_linenumber,
           CASE WHEN n >= 20 AND (n * sxx - sx * sx) > 0
               AND (n * syy - sy * sy) > 0
             THEN floor(CAST(n * sxy - sx * sy AS DOUBLE)
               / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                  * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
               * 1e6 + 0.5) / 1e6
           END AS corr6
         FROM s ORDER BY l_returnflag, l_orderkey, l_linenumber""",
    // f67: both sums accumulate in DECIMAL then round to 2dp; the share
    // divides the identical rounded doubles on both engines.
    "f67_q14_promo" ->
      """WITH m AS (SELECT date_trunc('month', l_shipdate) AS ship_month,
           CAST(round(sum(CASE WHEN p_type = 'PROMO'
               THEN CAST(l_extendedprice * (1.0 - l_discount)
                 AS DECIMAL(30,8))
               ELSE CAST(0 AS DECIMAL(30,8)) END), 2) AS DOUBLE)
             AS promo_rev,
           CAST(round(sum(CAST(l_extendedprice * (1.0 - l_discount)
             AS DECIMAL(30,8))), 2) AS DOUBLE) AS total_rev
         FROM lineitem JOIN part ON l_partkey = p_partkey
         GROUP BY 1)
         SELECT ship_month, promo_rev, total_rev,
           floor(promo_rev / total_rev * 1e6 + 0.5) / 1e6 AS promo_share6
         FROM m ORDER BY ship_month""",
    "f66_q4_late" ->
      """SELECT o.o_orderpriority,
           CAST(count(*) AS BIGINT) AS order_count
         FROM orders o
         WHERE EXISTS (
           SELECT 1 FROM lineitem l
           WHERE l.l_orderkey = o.o_orderkey
             AND date_diff('day', CAST(o.o_orderdate AS DATE),
               CAST(l.l_shipdate AS DATE)) > 30)
         GROUP BY 1 ORDER BY 1""",
    // f65: same star joins; the revenue expression computes in DECIMAL
    // before the exact sum (l_extendedprice*(1-l_discount) is a 2dp×4dp
    // product — exact at DECIMAL(30,8)).
    "f65_q7_volume" ->
      """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(year(o.o_orderdate) AS INTEGER) AS l_year,
           floor(CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
               AS DECIMAL(30,8))) AS DOUBLE) * 1e2 + 0.5) / 1e2
             AS revenue
         FROM lineitem l
         JOIN supplier s ON l.l_suppkey = s.s_suppkey
         JOIN orders o ON l.l_orderkey = o.o_orderkey
         JOIN customer c ON o.o_custkey = c.c_custkey
         JOIN nation sn ON s.s_nationkey = sn.n_nationkey
         JOIN nation cn ON c.c_nationkey = cn.n_nationkey
         WHERE sn.n_name <> cn.n_name
         GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""",
    // f64: same dim joins and DECIMAL-exact revenue sums; every share
    // is one double division of the exact totals.
    "f64_share_of_parent" ->
      """WITH bn AS (SELECT r.r_name AS region, n.n_name AS nation,
             CAST(sum(CAST(o.o_totalprice AS DECIMAL(30,8)))
               AS DECIMAL(38,8)) AS rev
           FROM orders o
           JOIN customer c ON o.o_custkey = c.c_custkey
           JOIN nation n ON c.c_nationkey = n.n_nationkey
           JOIN region r ON n.n_regionkey = r.r_regionkey
           GROUP BY 1, 2),
         br AS (SELECT region, CAST(sum(rev) AS DECIMAL(38,8)) AS rrev
           FROM bn GROUP BY 1),
         w AS (SELECT CAST(sum(rev) AS DECIMAL(38,8)) AS wrev FROM bn)
         SELECT bn.region, bn.nation,
           floor(CAST(bn.rev AS DOUBLE) * 1e2 + 0.5) / 1e2 AS rev2,
           floor(CAST(bn.rev AS DOUBLE) / CAST(br.rrev AS DOUBLE)
             * 1e6 + 0.5) / 1e6 AS nation_share6,
           floor(CAST(br.rrev AS DOUBLE) / CAST(w.wrev AS DOUBLE)
             * 1e6 + 0.5) / 1e6 AS region_share6
         FROM bn JOIN br USING (region) CROSS JOIN w
         ORDER BY region, nation""",
    // f62: exact BIGINT n/Σx/Σx² per group, micro-unit snapped
    // between-terms, the identical fixed-association F expression.
    "f62_anova" ->
      """WITH st AS (SELECT l_returnflag AS g, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS s,
             CAST(sum(CAST(l_quantity AS BIGINT)
               * CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
           FROM lineitem GROUP BY 1),
         tu AS (SELECT g, n, s, q,
             CAST(floor(CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
               / CAST(n AS DOUBLE) * 1e6 + 0.5) AS BIGINT) AS tu
           FROM st),
         tot AS (SELECT CAST(sum(n) AS BIGINT) AS bign,
             CAST(sum(s) AS BIGINT) AS bigs,
             CAST(sum(q) AS BIGINT) AS bigq,
             CAST(sum(tu) AS BIGINT) AS sumtu,
             CAST(count(*) AS BIGINT) AS k
           FROM tu)
         SELECT g, n,
           floor(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) * 1e6 + 0.5)
             / 1e6 AS mean6,
           CASE WHEN k >= 2 AND bign > k
               AND CAST(bigq AS DOUBLE) - CAST(sumtu AS DOUBLE) / 1e6 > 0
             THEN floor(((CAST(sumtu AS DOUBLE) / 1e6
                 - CAST(bigs AS DOUBLE) * CAST(bigs AS DOUBLE)
                   / CAST(bign AS DOUBLE)) / CAST(k - 1 AS DOUBLE))
               / ((CAST(bigq AS DOUBLE) - CAST(sumtu AS DOUBLE) / 1e6)
                 / CAST(bign - k AS DOUBLE)) * 1e6 + 0.5) / 1e6
           END AS f6,
           k - 1 AS df1, bign - k AS df2
         FROM tu, tot ORDER BY g""",
    // f63: identical incidence/count CTEs; every statistic is the same
    // fixed-association expression over exact BIGINT counts.
    "f63_assoc_rules" ->
      """WITH inc AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i
           FROM lineitem),
         tot AS (SELECT CAST(count(DISTINCT b) AS BIGINT) AS n FROM inc),
         ic AS (SELECT i, CAST(count(*) AS BIGINT) AS ni
           FROM inc GROUP BY 1),
         pr AS (SELECT a.i AS ante, c.i AS cons,
             CAST(count(*) AS BIGINT) AS nab
           FROM inc a JOIN inc c ON a.b = c.b AND a.i <> c.i
           GROUP BY 1, 2 HAVING count(*) >= 2)
         SELECT ante, cons, nab, x.ni AS na, y.ni AS nb,
           floor(CAST(nab AS DOUBLE) / CAST(n AS DOUBLE) * 1e6 + 0.5)
             / 1e6 AS support6,
           floor(CAST(nab AS DOUBLE) / CAST(x.ni AS DOUBLE) * 1e6 + 0.5)
             / 1e6 AS conf6,
           floor(CAST(n AS DOUBLE) * CAST(nab AS DOUBLE)
             / (CAST(x.ni AS DOUBLE) * CAST(y.ni AS DOUBLE)) * 1e6 + 0.5)
             / 1e6 AS lift6
         FROM pr JOIN ic x ON pr.ante = x.i
         JOIN ic y ON pr.cons = y.i
         CROSS JOIN tot ORDER BY ante, cons""",
    // f61: expected props are the same pinned 6dp literals; deviations
    // re-snap to exact micro-unit BIGINTs before the MAD mean.
    "f61_benford" ->
      """WITH v AS (SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
             AS c FROM orders
           WHERE floor(o_totalprice * 100 + 0.5) > 0),
         c0 AS (SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS INTEGER)
             AS digit, count(*) AS n
           FROM v GROUP BY 1),
         dg AS (SELECT CAST(d.digit AS INTEGER) AS digit,
             CAST(COALESCE(n, 0) AS BIGINT) AS n
           FROM (SELECT unnest(range(1, 10)) AS digit) d
           LEFT JOIN c0 ON d.digit = c0.digit),
         t AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM dg),
         ex AS (SELECT digit, n,
             floor(CAST(n AS DOUBLE) / tot * 1e6 + 0.5) / 1e6 AS obs6,
             CAST(CASE digit WHEN 1 THEN 0.301030 WHEN 2 THEN 0.176091
               WHEN 3 THEN 0.124939 WHEN 4 THEN 0.096910
               WHEN 5 THEN 0.079181 WHEN 6 THEN 0.066947
               WHEN 7 THEN 0.057992 WHEN 8 THEN 0.051153
               ELSE 0.045757 END AS DOUBLE) AS exp6
           FROM dg, t),
         du AS (SELECT digit, n, obs6, exp6,
             CAST(floor(abs(obs6 - exp6) * 1e6 + 0.5) AS BIGINT) AS u
           FROM ex),
         md AS (SELECT CAST(sum(u) AS BIGINT) AS su FROM du)
         SELECT digit, n, obs6, exp6,
           floor(CAST(su AS DOUBLE) / 9.0 + 0.5) / 1e6 AS mad6
         FROM du, md ORDER BY digit""",
    // f60: the same integer-cleared ECDF gap over distinct cents; the
    // max and its min-value location are order-free aggregates.
    "f60_ks_test" ->
      """WITH b AS (SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
             AS v FROM orders JOIN customer ON o_custkey = c_custkey
           WHERE c_mktsegment = 'BUILDING'),
         m AS (SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
             AS v FROM orders JOIN customer ON o_custkey = c_custkey
           WHERE c_mktsegment = 'MACHINERY'),
         cb AS (SELECT v, count(*) AS nb FROM b GROUP BY 1),
         cm AS (SELECT v, count(*) AS nm FROM m GROUP BY 1),
         j AS (SELECT COALESCE(cb.v, cm.v) AS v,
             CAST(COALESCE(nb, 0) AS BIGINT) AS nb,
             CAST(COALESCE(nm, 0) AS BIGINT) AS nm
           FROM cb FULL OUTER JOIN cm ON cb.v = cm.v),
         cum AS (SELECT v,
             CAST(sum(nb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
               PRECEDING AND CURRENT ROW) AS BIGINT) AS cum1,
             CAST(sum(nm) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
               PRECEDING AND CURRENT ROW) AS BIGINT) AS cum2
           FROM j),
         t AS (SELECT CAST(sum(nb) AS BIGINT) AS n1,
             CAST(sum(nm) AS BIGINT) AS n2 FROM j),
         g AS (SELECT v, abs(cum1 * n2 - cum2 * n1) AS gap
           FROM cum, t),
         mx AS (SELECT CAST(max(gap) AS BIGINT) AS gmax FROM g)
         SELECT t.n1, t.n2,
           floor(CAST(gmax AS DOUBLE)
             / (CAST(t.n1 AS DOUBLE) * CAST(t.n2 AS DOUBLE)) * 1e6 + 0.5)
             / 1e6 AS ks6,
           (SELECT min(v) FROM g, mx WHERE g.gap = mx.gmax) AS at_value
         FROM t, mx""",
    // f59: cents recovered exactly from the /100 display double
    // (floor(x·100+0.5) of c/100 is c); cumulative over DISTINCT cents
    // desc, joined back — the tie-totalized rule needs no row order.
    "f59_pareto" ->
      """WITH cust AS (SELECT o_custkey AS k,
             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
               AS BIGINT) AS c
           FROM orders GROUP BY 1),
         t AS (SELECT CAST(sum(c) AS BIGINT) AS tot FROM cust),
         byc AS (SELECT c, CAST(c * count(*) AS BIGINT) AS tv
           FROM cust GROUP BY 1),
         cm AS (SELECT c, tv,
             CAST(sum(tv) OVER (ORDER BY c DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum
           FROM byc)
         SELECT k AS o_custkey, CAST(cust.c AS DOUBLE) / 100 AS revenue,
           floor(CAST(cust.c AS DOUBLE) / tot * 1e6 + 0.5) / 1e6
             AS share6,
           floor(CAST(cum AS DOUBLE) / tot * 1e6 + 0.5) / 1e6
             AS cum_share6,
           CAST(cum - tv AS DOUBLE) < 0.8 * tot AS pareto
         FROM cust JOIN cm ON cust.c = cm.c, t ORDER BY o_custkey""",
    // f58: quantities are integral doubles, so the split-side sums are
    // order-free exact and merging is associativity itself.
    "f58_incr_agg" ->
      """SELECT l_returnflag, CAST(count(l_quantity) AS BIGINT) AS n,
           CAST(sum(l_quantity) AS DOUBLE) AS s,
           min(l_quantity) AS mn, max(l_quantity) AS mx
         FROM lineitem GROUP BY 1 ORDER BY 1""",
    // f57: per-bin terms floor to exact 1e-6-unit longs; the total is
    // their order-free sum windowed across every row.
    "f57_psi" ->
      """WITH e AS (SELECT CAST(floor(o_totalprice / 50000) AS BIGINT)
             AS bin, count(*) AS ne
           FROM orders
           WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
           GROUP BY 1),
         a AS (SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bin,
             count(*) AS na
           FROM orders
           WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
           GROUP BY 1),
         j AS (SELECT COALESCE(e.bin, a.bin) AS bin,
             CAST(COALESCE(ne, 0) AS BIGINT) AS n_expected,
             CAST(COALESCE(na, 0) AS BIGINT) AS n_actual
           FROM e FULL OUTER JOIN a ON e.bin = a.bin),
         t AS (SELECT CAST(sum(n_expected) AS BIGINT) AS nexp,
             CAST(sum(n_actual) AS BIGINT) AS nact FROM j),
         s AS (SELECT bin, n_expected, n_actual,
             CASE WHEN n_expected > 0 AND n_actual > 0 THEN
               floor((CAST(n_expected AS DOUBLE) / nexp
                   - CAST(n_actual AS DOUBLE) / nact)
                 * ln((CAST(n_expected AS DOUBLE) * nact)
                   / (CAST(n_actual AS DOUBLE) * nexp))
                 * 1e6 + 0.5) / 1e6
             END AS psi6
           FROM j, t)
         SELECT bin, n_expected, n_actual, psi6,
           CAST(sum(CASE WHEN psi6 IS NOT NULL THEN
               CAST(floor(psi6 * 1e6 + 0.5) AS BIGINT) ELSE 0 END)
             OVER () AS DOUBLE) / 1e6 AS psi_total
         FROM s ORDER BY bin""",
    "f56_gini" ->
      """WITH c AS (SELECT o_orderpriority AS g, o_totalprice AS v,
             o_orderkey AS tie,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
           FROM orders),
         r AS (SELECT g, cents,
             CAST(row_number() OVER (PARTITION BY g ORDER BY v, tie)
               AS BIGINT) AS rk
           FROM c),
         s AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cents) AS BIGINT) AS sc,
             CAST(sum(rk * cents) AS BIGINT) AS src
           FROM r GROUP BY 1)
         SELECT g, n,
           CASE WHEN sc > 0 THEN
             floor((2 * CAST(src AS DOUBLE) / (CAST(n AS DOUBLE) * sc)
               - (CAST(n AS DOUBLE) + 1) / n) * 1e6 + 0.5) / 1e6
           END AS gini6
         FROM s ORDER BY g""",
    "f55_woe_iv" ->
      """WITH b AS (SELECT CAST(floor(l_quantity / 10) AS BIGINT) AS bin,
             CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
               AS BIGINT) AS pos,
             CAST(sum(CASE WHEN l_returnflag = 'R' THEN 0 ELSE 1 END)
               AS BIGINT) AS neg
           FROM lineitem GROUP BY 1),
         t AS (SELECT CAST(sum(pos) AS BIGINT) AS post,
             CAST(sum(neg) AS BIGINT) AS negt FROM b),
         w AS (SELECT bin, pos, neg,
             CASE WHEN pos > 0 AND neg > 0 THEN
               floor(ln((CAST(pos AS DOUBLE) * negt)
                 / (CAST(neg AS DOUBLE) * post)) * 1e6 + 0.5) / 1e6
             END AS woe6,
             post, negt
           FROM b CROSS JOIN t),
         u AS (SELECT bin, pos, neg, woe6,
             CASE WHEN woe6 IS NOT NULL THEN
               CAST(floor((CAST(pos AS DOUBLE) / post
                 - CAST(neg AS DOUBLE) / negt) * woe6 * 1e6 + 0.5)
                 AS BIGINT)
             ELSE 0 END AS ivu
           FROM w),
         s AS (SELECT CAST(sum(ivu) AS BIGINT) AS ivt FROM u)
         SELECT bin, pos, neg, woe6, CAST(ivu AS DOUBLE) / 1e6 AS iv6,
           CAST(s.ivt AS DOUBLE) / 1e6 AS iv_total
         FROM u CROSS JOIN s ORDER BY bin""",
    "f54_cdc_apply" ->
      """WITH snap AS (SELECT c_custkey, c_acctbal, c_nationkey
           FROM customer),
         ch AS (
           SELECT c_custkey, c_acctbal, c_nationkey, 'D' AS op
           FROM snap WHERE c_custkey % 10 = 0
           UNION ALL
           SELECT c_custkey, c_acctbal + CAST(100.0 AS DOUBLE),
             c_nationkey, 'U'
           FROM snap WHERE c_custkey % 10 = 1
           UNION ALL
           SELECT c_custkey + 1000000, c_acctbal, c_nationkey, 'I'
           FROM snap WHERE c_custkey % 10 = 2)
         SELECT s.c_custkey, s.c_acctbal, s.c_nationkey FROM snap s
         WHERE s.c_custkey NOT IN (SELECT c_custkey FROM ch)
         UNION ALL
         SELECT c_custkey, c_acctbal, c_nationkey FROM ch WHERE op <> 'D'
         ORDER BY c_custkey""",
    "f52_expectations" ->
      """WITH r1 AS (SELECT 'l_quantity_range' AS rule,
             CAST(sum(CASE WHEN NOT (l_quantity BETWEEN 1 AND 50)
               THEN 1 ELSE 0 END) AS BIGINT) AS violations,
             CAST(count(*) AS BIGINT) AS total FROM lineitem),
         r2 AS (SELECT 'l_discount_le_5pct',
             CAST(sum(CASE WHEN l_discount > CAST(0.05 AS DOUBLE)
               THEN 1 ELSE 0 END) AS BIGINT),
             CAST(count(*) AS BIGINT) FROM lineitem),
         r3 AS (SELECT 'l_shipdate_not_null',
             CAST(sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END)
               AS BIGINT),
             CAST(count(*) AS BIGINT) FROM lineitem),
         u AS (SELECT 'li_line_unique',
             CAST(count(*) - count(DISTINCT (l_orderkey, l_linenumber))
               AS BIGINT),
             CAST(count(*) AS BIGINT) FROM lineitem),
         fk1 AS (SELECT 'li_order_fk',
             CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)
               AS BIGINT),
             CAST(count(*) AS BIGINT)
           FROM lineitem l LEFT JOIN
             (SELECT DISTINCT o_orderkey FROM orders) o
             ON l.l_orderkey = o.o_orderkey),
         fk2 AS (SELECT 'orders_cust_fk',
             CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
               AS BIGINT),
             CAST(count(*) AS BIGINT)
           FROM orders od LEFT JOIN
             (SELECT DISTINCT c_custkey FROM customer) c
             ON od.o_custkey = c.c_custkey)
         SELECT rule, violations, total, violations = 0 AS pass
         FROM (SELECT * FROM r1 UNION ALL SELECT * FROM r2
           UNION ALL SELECT * FROM r3 UNION ALL SELECT * FROM u
           UNION ALL SELECT * FROM fk1 UNION ALL SELECT * FROM fk2)
         ORDER BY rule""",
    "f53_skew_report" ->
      """WITH c AS (SELECT l_suppkey AS key, count(*) AS cnt
           FROM lineitem GROUP BY 1),
         t AS (SELECT CAST(sum(cnt) AS BIGINT) AS total,
             CAST(count(*) AS BIGINT) AS nkeys FROM c)
         SELECT key, cnt,
           floor(CAST(cnt AS DOUBLE) / total * 1e6 + 0.5) / 1e6 AS share6,
           floor(CAST(cnt AS DOUBLE) * nkeys / total * 1e6 + 0.5) / 1e6
             AS skew6
         FROM c CROSS JOIN t
         ORDER BY cnt DESC, key ASC LIMIT 20""",
    // f51: U terms are exact 0.5-multiples of integer products (order-free
    // sums); z and rank-biserial mirror the Spark association exactly.
    "f51_mannwhitney" ->
      """WITH x AS (SELECT l_returnflag AS grp,
             CAST(l_quantity AS DOUBLE) AS v
           FROM lineitem WHERE l_returnflag IN ('A', 'R')),
         c AS (SELECT v,
             CAST(sum(CASE WHEN grp = 'A' THEN 1 ELSE 0 END) AS BIGINT)
               AS na,
             CAST(sum(CASE WHEN grp = 'R' THEN 1 ELSE 0 END) AS BIGINT)
               AS nb
           FROM x GROUP BY 1),
         r AS (SELECT na, nb,
             CAST(sum(nb) OVER (ORDER BY v) AS BIGINT) AS cb FROM c),
         s AS (SELECT CAST(sum(na) AS BIGINT) AS n1,
             CAST(sum(nb) AS BIGINT) AS n2,
             sum(CAST(na AS DOUBLE) * CAST(cb - nb AS DOUBLE)
               + CAST(0.5 AS DOUBLE) * na * nb) AS u1,
             sum(CAST(na + nb AS DOUBLE) * CAST(na + nb AS DOUBLE)
                 * CAST(na + nb AS DOUBLE)
               - CAST(na + nb AS DOUBLE)) AS ties
           FROM r)
         SELECT n1, n2, u1,
           floor((u1 - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 2)
             / sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12
               * ((CAST(n1 + n2 AS DOUBLE) + 1)
                  - ties / (CAST(n1 + n2 AS DOUBLE)
                    * (CAST(n1 + n2 AS DOUBLE) - 1))))
             * 1e6 + 0.5) / 1e6 AS z6,
           floor((1 - 2 * u1 / (CAST(n1 AS DOUBLE) * n2)) * 1e6 + 0.5)
             / 1e6 AS r_rb6
         FROM s ORDER BY n1""",
    "f49_skyline" ->
      """WITH pts AS (SELECT p_retailprice AS x, max(p_size) AS y
           FROM part GROUP BY 1)
         SELECT x, y FROM pts a
         WHERE NOT EXISTS (SELECT 1 FROM pts b
           WHERE b.x < a.x AND b.y >= a.y)
         ORDER BY x""",
    "f50_weighted_median" ->
      """WITH c AS (SELECT l_returnflag AS g, l_extendedprice AS v,
           sum(l_quantity) OVER (PARTITION BY l_returnflag
             ORDER BY l_extendedprice, l_orderkey, l_linenumber
             ROWS UNBOUNDED PRECEDING) AS cw,
           sum(l_quantity) OVER (PARTITION BY l_returnflag) AS tw
           FROM lineitem)
         SELECT g AS l_returnflag, arg_min(v, cw) AS wq_l_extendedprice
         FROM c WHERE cw >= tw * 0.5 GROUP BY 1 ORDER BY 1""",
    "f47_robust_outliers" ->
      """WITH m AS (SELECT l_returnflag AS flag,
             floor(quantile_cont(l_extendedprice, 0.5) * 1e6 + 0.5) / 1e6
               AS med
           FROM lineitem GROUP BY 1),
         a AS (SELECT l.l_returnflag AS flag, l.l_extendedprice AS v,
             m.med
           FROM lineitem l JOIN m ON l.l_returnflag = m.flag),
         d AS (SELECT flag, min(med) AS med,
             floor(quantile_cont(abs(v - med), 0.5) * 1e6 + 0.5) / 1e6
               AS mad
           FROM a GROUP BY 1)
         SELECT a.flag AS l_returnflag, count(*) AS n, d.med, d.mad,
           CAST(sum(CASE WHEN abs(a.v - d.med)
               > 3 * CAST(1.4826 AS DOUBLE) * d.mad
             THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
         FROM a JOIN d USING (flag)
         GROUP BY a.flag, d.med, d.mad ORDER BY a.flag""",
    "f44_corrwith" ->
      """WITH l AS (SELECT c_custkey, c_acctbal AS bal,
             CAST(c_nationkey AS DOUBLE) AS nat FROM customer),
         r AS (SELECT c_custkey,
             c_acctbal * CAST(0.5 AS DOUBLE) + c_custkey % 100 AS bal,
             CAST(25 - c_nationkey AS DOUBLE) AS nat FROM customer),
         j AS (SELECT l.bal AS lb, r.bal AS rb, l.nat AS ln2, r.nat AS rn
           FROM l JOIN r USING (c_custkey))
         SELECT 'bal' AS colname,
           floor(corr(lb, rb) * 1e6 + 0.5) / 1e6 AS corr FROM j
         UNION ALL SELECT 'nat',
           floor(corr(ln2, rn) * 1e6 + 0.5) / 1e6 FROM j
         ORDER BY colname""",
    "f43_compare" ->
      """WITH r AS (SELECT c_custkey,
             CASE WHEN c_custkey % 10 = 0 THEN c_acctbal + 10.0
                  ELSE c_acctbal END AS o_bal,
             CASE WHEN c_custkey % 13 = 0 THEN 'ALTERED'
                  ELSE c_mktsegment END AS o_seg
           FROM customer),
         j AS (SELECT c.c_custkey,
             c.c_acctbal, r.o_bal, c.c_mktsegment, r.o_seg,
             (c.c_acctbal IS DISTINCT FROM r.o_bal) AS d_bal,
             (c.c_mktsegment IS DISTINCT FROM r.o_seg) AS d_seg
           FROM customer c JOIN r USING (c_custkey))
         SELECT c_custkey,
           CASE WHEN d_bal THEN c_acctbal END AS c_acctbal_self,
           CASE WHEN d_bal THEN o_bal END AS c_acctbal_other,
           CASE WHEN d_seg THEN c_mktsegment END AS c_mktsegment_self,
           CASE WHEN d_seg THEN o_seg END AS c_mktsegment_other
         FROM j WHERE d_bal OR d_seg ORDER BY c_custkey""",
    "f41_merge_validate" ->
      """SELECT c.c_custkey, c.c_nationkey AS nk, c.c_name AS name_x,
           n.n_name AS name_y
         FROM customer c LEFT JOIN nation n
           ON c.c_nationkey = n.n_nationkey
         ORDER BY c.c_custkey""",
    "f40_cov_matrix" ->
      """WITH p AS (
           SELECT 'l_quantity' AS c1, 'l_quantity' AS c2,
             covar_samp(l_quantity, l_quantity) AS cov FROM lineitem
           UNION ALL SELECT 'l_quantity', 'l_discount',
             covar_samp(l_quantity, l_discount) FROM lineitem
           UNION ALL SELECT 'l_quantity', 'l_tax',
             covar_samp(l_quantity, l_tax) FROM lineitem
           UNION ALL SELECT 'l_discount', 'l_discount',
             covar_samp(l_discount, l_discount) FROM lineitem
           UNION ALL SELECT 'l_discount', 'l_tax',
             covar_samp(l_discount, l_tax) FROM lineitem
           UNION ALL SELECT 'l_tax', 'l_tax',
             covar_samp(l_tax, l_tax) FROM lineitem)
         SELECT c1, c2, floor(cov * 1e6 + 0.5) / 1e6 AS cov
         FROM p ORDER BY c1, c2""",
    "f32_get_dummies" ->
      """SELECT c_custkey AS custkey,
           CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 1 ELSE 0 END
             AS mkt_AUTOMOBILE,
           CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END
             AS mkt_BUILDING,
           CASE WHEN c_mktsegment = 'FURNITURE' THEN 1 ELSE 0 END
             AS mkt_FURNITURE,
           CASE WHEN c_mktsegment = 'HOUSEHOLD' THEN 1 ELSE 0 END
             AS mkt_HOUSEHOLD,
           CASE WHEN c_mktsegment = 'MACHINERY' THEN 1 ELSE 0 END
             AS mkt_MACHINERY
         FROM customer ORDER BY custkey""",
    "f30_merge_indicator" ->
      """WITH o AS (SELECT o_custkey AS custkey, count(*) AS n_orders
                    FROM orders GROUP BY 1)
         SELECT coalesce(c.c_custkey, o.custkey) AS custkey, c_mktsegment,
           n_orders,
           CASE WHEN c.c_custkey IS NOT NULL AND o.custkey IS NOT NULL
             THEN 'both'
             WHEN c.c_custkey IS NOT NULL THEN 'left_only'
             ELSE 'right_only' END AS _merge
         FROM customer c FULL JOIN o ON c.c_custkey = o.custkey
         ORDER BY custkey""",
    "f28_group_nunique" ->
      """SELECT o_orderpriority,
           count(DISTINCT o_custkey) AS nd_cust,
           count(DISTINCT o_orderstatus) AS nd_status,
           count(*) AS n
         FROM orders GROUP BY 1 ORDER BY 1""",
    "f29_window_pct" ->
      """SELECT o_orderkey, o_orderpriority,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cume_dist,
           CAST(ntile(4) OVER w AS INTEGER) AS tile
         FROM orders WHERE o_orderkey <= 20000
         WINDOW w AS (PARTITION BY o_orderpriority
           ORDER BY o_totalprice, o_orderkey)
         ORDER BY o_orderkey""",
    "f01_assign_revenue" ->
      s"""SELECT $liIdxSql AS idx, l_extendedprice * (1 - l_discount) AS revenue
          FROM lineitem ORDER BY idx""",
    "f02_filter_project" ->
      s"""SELECT $liIdxSql AS idx, l_quantity, l_extendedprice FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1999-01-01' AND l_quantity < 10
          ORDER BY idx""",
    "f03_q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(30,8))), 2) AS DOUBLE) AS sum_px,
           round(avg(l_discount), 6) AS avg_disc,
           count(*) AS cnt
         FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""",
    "f04_join_agg" ->
      """SELECT c_mktsegment,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(30,8))), 2) AS DOUBLE) AS sum_price,
           count(*) AS cnt
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY 1 ORDER BY 1""",
    "f05_broadcast_dims" ->
      """SELECT n_name,
           CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,8))), 2) AS DOUBLE) AS revenue
         FROM lineitem
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation ON s_nationkey = n_nationkey
         GROUP BY 1 ORDER BY 1""",
    "f06_topk_orders" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
    "f07_window_rank" ->
      """SELECT o_custkey, o_orderkey, rk FROM (
           SELECT o_custkey, o_orderkey,
             CAST(row_number() OVER (PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rk
           FROM orders) WHERE rk <= 3 ORDER BY o_custkey, rk""",
    "f08_running_sum" ->
      """SELECT o_orderkey, round(sum(o_totalprice) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS run_total
         FROM orders ORDER BY o_orderkey""",
    "f09_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
         ORDER BY 1, 2""",
    "f10_except" ->
      """SELECT c_custkey FROM customer
         EXCEPT SELECT o_custkey FROM orders ORDER BY 1""",
    "f11_semi_join" ->
      """SELECT c_mktsegment, count(*) AS cnt FROM customer
         WHERE c_custkey IN (SELECT o_custkey FROM orders)
         GROUP BY 1 ORDER BY 1""",
    "f12_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS flag,
           coalesce(l_linestatus, 'ALL') AS status,
           round(sum(l_quantity), 2) AS sum_qty, count(*) AS cnt
         FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
         ORDER BY 1, 2""",
    "f46_cube" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS flag,
           coalesce(l_linestatus, 'ALL') AS status,
           round(sum(l_quantity), 2) AS sum_qty, count(*) AS cnt
         FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
         ORDER BY 1, 2""",
    "f13_pivot" ->
      """SELECT l_linestatus,
           round(sum(l_quantity) FILTER (l_returnflag = 'A'), 2) AS A,
           round(sum(l_quantity) FILTER (l_returnflag = 'N'), 2) AS N,
           round(sum(l_quantity) FILTER (l_returnflag = 'R'), 2) AS R
         FROM lineitem GROUP BY 1 ORDER BY 1""",
    "f14_salted_join" ->
      """SELECT c_mktsegment, count(*) AS cnt
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY 1 ORDER BY 1""",
    "f16_q3_shipping" ->
      """SELECT l_orderkey, o_orderdate,
           CAST(round(sum(CAST(l_extendedprice * (1.0 - l_discount)
             AS DECIMAL(30,8))), 2) AS DOUBLE) AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         WHERE c_mktsegment = 'BUILDING'
           AND o_orderdate < TIMESTAMP '1998-01-01'
           AND l_shipdate > TIMESTAMP '1998-01-01'
         GROUP BY 1, 2
         ORDER BY revenue DESC, l_orderkey LIMIT 10""",
    "f17_q18_smj" ->
      """SELECT o_orderkey, o_custkey, o_totalprice,
           round(sum(l_quantity), 2) AS sum_qty
         FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         WHERE o_orderkey IN (
           SELECT l_orderkey FROM lineitem
           GROUP BY 1 HAVING sum(l_quantity) > 200)
         GROUP BY 1, 2, 3
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""",
    "f20_write_roundtrip" ->
      """SELECT l_linestatus, count(*) AS n, round(sum(l_quantity), 2) AS qty
         FROM lineitem WHERE l_returnflag = 'A'
         GROUP BY 1 ORDER BY 1""",
    "f23_group_transform" ->
      """WITH w AS (SELECT c_custkey, c_nationkey, c_acctbal,
           avg(c_acctbal) OVER (PARTITION BY c_nationkey) AS nmean,
           stddev_samp(c_acctbal) OVER (PARTITION BY c_nationkey) AS nstd
         FROM customer)
         SELECT c_custkey, c_nationkey,
           round(c_acctbal - nmean, 6) AS demeaned,
           round((c_acctbal - nmean) / nullif(nstd, 0), 6) AS zscore
         FROM w ORDER BY c_custkey""",
    // f21: exact group stats verbatim; the sketch columns arrive as
    // in-bound indicators the oracle pins to TRUE — an out-of-bound
    // sketch value hash-mismatches instead of hiding behind rows-only.
    "f21_sketch_stats" ->
      """SELECT o_orderpriority AS priority,
           count(*) AS n_orders,
           count(DISTINCT o_custkey) AS nd_cust_exact,
           TRUE AS nd_in_bound,
           min(o_totalprice) AS min_price,
           max(o_totalprice) AS max_price,
           TRUE AS med_in_bound
         FROM orders GROUP BY 1 ORDER BY 1""",
    // f24: the five exact stat rows are f22's spellings verbatim; the
    // three quartile rows are in-band indicators pinned to 1.0.
    "f24_describe_approx" ->
      """WITH c AS (SELECT CAST(c_custkey AS DOUBLE) AS a,
             CAST(c_nationkey AS DOUBLE) AS b, c_acctbal AS v FROM customer)
         SELECT 'count' AS stat, CAST(count(a) AS DOUBLE) AS c_custkey,
           CAST(count(b) AS DOUBLE) AS c_nationkey,
           CAST(count(v) AS DOUBLE) AS c_acctbal FROM c
         UNION ALL SELECT 'mean', round(avg(a), 6), round(avg(b), 6),
           round(avg(v), 6) FROM c
         UNION ALL SELECT 'std', round(stddev_samp(a), 6),
           round(stddev_samp(b), 6), round(stddev_samp(v), 6) FROM c
         UNION ALL SELECT 'min', min(a), min(b), round(min(v), 6) FROM c
         UNION ALL SELECT 'max', max(a), max(b), round(max(v), 6) FROM c
         UNION ALL SELECT '25%_ok', 1.0, 1.0, 1.0
         UNION ALL SELECT '50%_ok', 1.0, 1.0, 1.0
         UNION ALL SELECT '75%_ok', 1.0, 1.0, 1.0
         ORDER BY stat""",
    "f22_describe" ->
      """WITH c AS (SELECT CAST(c_custkey AS DOUBLE) AS a,
             CAST(c_nationkey AS DOUBLE) AS b, c_acctbal AS v FROM customer)
         SELECT 'count' AS stat, CAST(count(a) AS DOUBLE) AS c_custkey,
           CAST(count(b) AS DOUBLE) AS c_nationkey,
           CAST(count(v) AS DOUBLE) AS c_acctbal FROM c
         UNION ALL SELECT 'mean', round(avg(a), 6), round(avg(b), 6),
           round(avg(v), 6) FROM c
         UNION ALL SELECT 'std', round(stddev_samp(a), 6),
           round(stddev_samp(b), 6), round(stddev_samp(v), 6) FROM c
         UNION ALL SELECT 'min', min(a), min(b), round(min(v), 6) FROM c
         UNION ALL SELECT '25%', round(quantile_cont(a, 0.25), 6),
           round(quantile_cont(b, 0.25), 6), round(quantile_cont(v, 0.25), 6)
           FROM c
         UNION ALL SELECT '50%', round(quantile_cont(a, 0.5), 6),
           round(quantile_cont(b, 0.5), 6), round(quantile_cont(v, 0.5), 6)
           FROM c
         UNION ALL SELECT '75%', round(quantile_cont(a, 0.75), 6),
           round(quantile_cont(b, 0.75), 6), round(quantile_cont(v, 0.75), 6)
           FROM c
         UNION ALL SELECT 'max', max(a), max(b), round(max(v), 6) FROM c
         ORDER BY stat""",
    "f19_q5_sql" ->
      """SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
         FROM customer JOIN orders ON c_custkey = o_custkey
         JOIN lineitem ON l_orderkey = o_orderkey
         JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE r_name = 'ASIA'
         GROUP BY n_name ORDER BY revenue DESC, n_name""",
    "f18_group_quantiles" ->
      """SELECT l_returnflag,
           round(quantile_cont(l_quantity, 0.5), 6) AS med_qty,
           round(quantile_cont(l_extendedprice, 0.95), 6) AS p95_price,
           count(*) AS n
         FROM lineitem GROUP BY 1 ORDER BY 1""",
    "f15_melt" ->
      s"""SELECT $liIdxSql AS idx, 'l_quantity' AS metric, l_quantity AS value FROM lineitem
         UNION ALL
         SELECT $liIdxSql, 'l_extendedprice', l_extendedprice FROM lineitem
         UNION ALL
         SELECT $liIdxSql, 'l_tax', l_tax FROM lineitem
         ORDER BY idx, metric"""
  )
}
