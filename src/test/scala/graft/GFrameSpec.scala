package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.{GFrame, Series}

/** The DataFrame layer the reference never built (pontem/dataframe is an
  * empty package; README.md:16-19 sketches `df['new'] = df['col'] * 2`). */
class GFrameSpec extends AnyFunSuite with SparkFixture {

  import spark.implicits._

  private lazy val gf = GFrame.fromDF(
    Seq((1L, 10.0, "a"), (2L, 20.0, "b"), (3L, 30.0, "a"), (4L, 40.0, "b"))
      .toDF("id", "v", "g"), "id")

  private def rows(g: GFrame): Seq[Seq[Any]] =
    g.toDF.orderBy(col(g.indexName)).collect().map(_.toSeq.toSeq).toSeq

  test("column access returns a same-base Series; arithmetic composes join-free") {
    val doubled = gf("v") * 2.0
    val out = gf.assign("v2", doubled)
    assert(rows(out).map(_.last) == Seq(20.0, 40.0, 60.0, 80.0))
    assert(!out.toDF.queryExecution.executedPlan.toString.toLowerCase.contains("join"))
  }

  test("groupHead keeps the first n per group through WindowGroupLimit") {
    val df = Seq((1L, "a", 3.0), (2L, "a", 1.0), (3L, "a", 2.0),
      (4L, "b", 9.0), (5L, "b", 8.0)).toDF("id", "g", "v")
    val out = GFrame.fromDF(df, "id")
      .groupHead(Seq(col("g")), Seq(col("v").asc, col("id").asc), 2)
    val got = out.toDF.orderBy("id").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(2L, 3L, 5L, 4L).sorted)
    val plan = out.toDF.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("groupFilter keeps member rows of groups passing the aggregate") {
    val df = Seq((1L, "a", 3.0), (2L, "a", 1.0), (3L, "a", 2.0),
      (4L, "b", 9.0), (5L, "b", 8.0)).toDF("id", "g", "v")
    val out = GFrame.fromDF(df, "id")
      .groupFilter(Seq(col("g")), count(lit(1)), _ >= 3)
    val got = out.toDF.orderBy("id").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L, 2L, 3L)) // only group a has >= 3 rows
    // helper column dropped, schema unchanged
    assert(out.toDF.columns.toSeq == Seq("id", "g", "v"))
  }

  test("dropDuplicatesBy keeps a deterministic survivor per subset key") {
    val df = Seq((3L, "a", 1), (1L, "a", 1), (2L, "b", 1), (5L, "a", 2))
      .toDF("id", "k1", "k2")
    def ids(keep: String) = GFrame.fromDF(df, "id")
      .dropDuplicatesBy(Seq(col("k1"), col("k2")), keep)
      .toDF.collect().map(_.getLong(0)).toSet
    assert(ids("first") == Set(1L, 2L, 5L))
    assert(ids("last") == Set(3L, 2L, 5L))
  }

  test("cross-frame assign aligns on index via join") {
    val other = Series.fromPairs(spark, Seq((1L, 100.0), (3L, 300.0)), name = "x")
    val out = gf.assign("x", other)
    assert(rows(out).map(_.last) == Seq(100.0, null, 300.0, null))
  }

  test("cross-frame assign OVERWRITES an existing column (pandas semantics)") {
    val other = Series.fromPairs(spark, Seq((1L, -1.0), (2L, -2.0)), name = "v")
    val out = gf.assign("v", other) // "v" already exists on gf
    assert(out.columns.count(_ == "v") == 1)
    // NB the re-assigned column moves to the end (drop + join append)
    assert(rows(out).map(_.last) == Seq(-1.0, -2.0, null, null))
    // and the column stays addressable (no ambiguous reference)
    assert(out.filter(col("v") === -1.0).count() == 1)
  }

  test("select retains the index; filter/where") {
    assert(gf.select("v").columns == Seq("id", "v"))
    assert(gf.filter(col("v") > 25.0).count() == 2)
  }

  test("groupBy agg returns keyed GFrame") {
    val agg = gf.groupBy("g").agg(sum(col("v")).as("s"))
    assert(agg.indexName == "g")
    assert(agg.toDF.orderBy("g").collect().map(_.getDouble(1)).toSeq == Seq(40.0, 60.0))
  }

  test("join + semiJoin + antiJoin") {
    val dim = GFrame.fromDF(Seq(("a", "alpha")).toDF("k", "label"), "k")
    val j = gf.join(dim, gf.df("g") === dim.df("k"), broadcastRight = true)
    assert(j.count() == 2)
    assert(gf.semiJoin(dim, gf.df("g") === dim.df("k")).count() == 2)
    assert(gf.antiJoin(dim, gf.df("g") === dim.df("k")).count() == 2)
  }

  test("large-large joins are runtime-bloom-filter eligible (probe pruning)") {
    // At 100 TB the win on a selective fact⨝fact join is Spark's runtime
    // bloom filter: built from the filtered build side, applied INSIDE the
    // probe-side scan, so most of the big table never reaches the shuffle.
    // Eligibility needs exactly what our join plans provide — file scans +
    // equi-join + a selective build-side predicate. Local data is far below
    // the 10 GiB application-side default, so lower the threshold (and pin
    // the join to shuffle) for the plan assertion only.
    val dir = java.nio.file.Files.createTempDirectory("graft_bloom").toString
    spark.range(0, 10000)
      .select(col("id").as("k"), (col("id") % 100).as("v"))
      .write.mode("overwrite").parquet(s"$dir/big")
    spark.range(0, 1000)
      .select(col("id").as("k"), (col("id") % 7).as("tag"))
      .write.mode("overwrite").parquet(s"$dir/small")
    val conf = spark.conf
    val thresholdKey =
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    val saved = Seq("spark.sql.autoBroadcastJoinThreshold", thresholdKey)
      .map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set(thresholdKey, "0")
      val big = spark.read.parquet(s"$dir/big")
      val small = spark.read.parquet(s"$dir/small").filter(col("tag") === 3)
      val joined = big.join(small, "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain"), s"no runtime bloom filter:\n$plan")
      assert(joined.count() == 143) // ids ≡ 3 (mod 7) in [0,1000)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }

  test("withGroupAgg broadcasts the group aggregate onto member rows") {
    val out = gf.withGroupAgg("gsum", sum(col("v")), Seq(col("g")))
      .toDF.orderBy("id").collect().map(_.getDouble(3)).toSeq
    assert(out == Seq(40.0, 60.0, 40.0, 60.0)) // a: 10+30, b: 20+40
    // unordered whole-partition frame: the window spec carries NO ordering
    val plan = gf.withGroupAgg("m", avg(col("v")), Seq(col("g")))
      .toDF.queryExecution.optimizedPlan.toString
    assert(plan.contains("windowspecdefinition(g"), plan)
    assert(!plan.contains("windowspecdefinition(g#, v"), plan)
  }

  test("describe yields pandas stat rows from one aggregate pass") {
    val d = GFrame.fromDF(
      Seq((1L, 1.0), (2L, 2.0), (3L, 3.0), (4L, 4.0)).toDF("id", "v"), "id")
    val out = d.describe("v").df.collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out("count") == 4.0 && out("mean") == 2.5)
    assert(math.abs(out("std") - 1.2909944487358056) < 1e-12)
    assert(out("min") == 1.0 && out("max") == 4.0)
    assert(out("25%") == 1.75 && out("50%") == 2.5 && out("75%") == 3.25)
    // single aggregate: exactly one (partial+final) HashAggregate pair
    val plan = d.describe("v").df.queryExecution.executedPlan.toString
    assert(plan.split("HashAggregate").length - 1 <= 2, plan)
  }

  test("describeApprox quartiles land within rank-error bounds of exact (f24)") {
    val df = spark.range(0, 5000)
      .select(col("id").as("idx"), col("id").cast("double").as("v"))
    val g = GFrame.fromDF(df, "idx")
    val approx = g.describeApprox(10000, "v").df.collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val exact = g.describe("v").df.collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    // non-quartile stats are the SAME aggregates — must match exactly
    Seq("count", "mean", "std", "min", "max").foreach { s =>
      assert(approx(s) == exact(s), s"$s: ${approx(s)} vs ${exact(s)}")
    }
    // sketch quartiles: rank error <= n/accuracy = 5000/10000 => the
    // returned element sits within 1 rank of the true quantile position
    // (values here ARE ranks, so compare directly with slack 1.0 + the
    // interpolation gap <= 1.0)
    Seq("25%", "50%", "75%").foreach { s =>
      assert(math.abs(approx(s) - exact(s)) <= 2.0,
        s"$s: ${approx(s)} vs ${exact(s)}")
    }
  }

  test("sketch aggregates land within error bounds of the exact answers") {
    val df = spark.range(0, 5000)
      .select(col("id").as("idx"), (col("id") % 1000).cast("double").as("v"))
    val s = Series.fromColumn(df, "v", "idx")
    // HLL++ at rsd 0.02 on 1000 distincts: allow 3 sigma
    val nd = s.approxNunique(rsd = 0.02)
    assert(math.abs(nd - 1000L) <= 60, s"approxNunique $nd vs exact 1000")
    // GK sketch returns an element near the true median 499/500
    val med = s.approxQuantile(0.5).asInstanceOf[Double]
    assert(med >= 495.0 && med <= 505.0, s"approxQuantile $med")
    // and the f21 gate's grouped shape: one sketch pair per group. Exact
    // per-group distinct is 250: v = id%1000 restricted to id ≡ g (mod 4)
    // hits only residues ≡ g mod 4 (gcd(4,1000) = 4 → 1000/4 values).
    val grouped = df.withColumn("g", col("idx") % 4)
      .groupBy("g")
      .agg(approx_count_distinct(col("v"), 0.02).as("nd"))
      .collect().map(r => r.getLong(1))
    grouped.foreach(n => assert(math.abs(n - 250L) <= 20, n))
  }

  test("set ops") {
    val a = GFrame.fromDF(Seq(1L, 2L, 3L).toDF("id"), "id")
    val b = GFrame.fromDF(Seq(2L, 3L, 4L).toDF("id"), "id")
    assert(a.except(b).toDF.as[Long].collect().toSet == Set(1L))
    assert(a.intersect(b).toDF.as[Long].collect().toSet == Set(2L, 3L))
    assert(a.union(b).count() == 6)
  }

  test("window helpers: rank / running / lag") {
    val ranked = gf.withRank("rk", Seq(col("g")), Seq(col("v").desc))
    val top = ranked.filter(col("rk") === 1).toDF
      .select("g", "v").orderBy("g").collect().map(_.getDouble(1)).toSeq
    assert(top == Seq(30.0, 40.0))
    val run = gf.withRunning("rs", sum(col("v")), Seq(col("g")), Seq(col("id")))
    assert(run.toDF.orderBy("id").collect().map(_.getDouble(3)).toSeq
      == Seq(10.0, 20.0, 40.0, 60.0))
    val lagd = gf.withLag("prev", col("v"), 1, Seq(col("g")), Seq(col("id")))
    assert(lagd.toDF.orderBy("id").collect().map(_.get(3)).toSeq
      == Seq(null, null, 10.0, 20.0))
  }

  test("pivot with explicit values") {
    val p = gf.pivot("g", "id", Seq(1, 2, 3, 4), first(col("v")))
    val row = p.toDF.orderBy("g").collect()
    assert(row(0).toSeq == Seq("a", 10.0, null, 30.0, null))
  }

  test("rollup produces subtotals") {
    val r = gf.rollup(col("g")).agg(sum(col("v")).as("s"))
    assert(r.count() == 3) // a, b, grand total
  }

  test("fromSeries builds an aligned frame") {
    val a = Series.fromPairs(spark, Seq((1L, 1.0), (2L, 2.0)), name = "a")
    val b = Series.fromPairs(spark, Seq((2L, 20.0), (3L, 30.0)), name = "b")
    val f = GFrame.fromSeries(a, b)
    assert(f.count() == 3)
    assert(f.columns == Seq("index", "a", "b"))
  }

  test("rename remaps the index name too") {
    val r = gf.rename("id" -> "key", "v" -> "value")
    assert(r.indexName == "key")
    assert(r.columns.contains("value"))
  }

  test("withPctWindows: three relative-position stats from one Window node") {
    val p = gf.withPctWindows(Seq(col("g")), Seq(col("v")), ntiles = 2)
    val byId = p.toDF.orderBy("id").collect()
    // g=a holds v=10,30: pct_rank 0/1, cume_dist .5/1, tiles 1/2
    assert(byId(0).toSeq.drop(3) == Seq(0.0, 0.5, 1))
    assert(byId(2).toSeq.drop(3) == Seq(1.0, 1.0, 2))
    val plan = p.toDF.queryExecution.executedPlan.toString
    assert(plan.split("\\bWindow\\b").length - 1 == 1,
      s"expected one Window node:\n$plan")
  }

  test("crosstab counts cells and zero-fills empty ones") {
    val ct = gf.crosstab("g", "id", Seq(1, 2, 99))
    val byG = ct.toDF.orderBy("g").collect()
    assert(byG(0).toSeq == Seq("a", 1L, 0L, 0L)) // g=a: id 1 once, no 2/99
    assert(byG(1).toSeq == Seq("b", 0L, 1L, 0L))
  }

  test("mergeIndicator labels both/left_only/right_only") {
    val l = GFrame.fromDF(Seq((1L, "a"), (2L, "b")).toDF("k", "lv"), "k")
    val r = GFrame.fromDF(Seq((2L, 9.0), (3L, 8.0)).toDF("k", "rv"), "k")
    val m = l.mergeIndicator(r, Seq("k")).toDF.orderBy("k").collect()
    assert(m.map(_.getString(3)).toSeq
      == Seq("left_only", "both", "right_only"))
  }

  test("nlargest plans as TakeOrderedAndProject (no global sort)") {
    val g = GFrame.fromDF(
      Seq((1L, 5.0), (2L, 9.0), (3L, 7.0), (4L, 9.0)).toDF("k", "v"), "k")
    val top = g.nlargest(2, Seq("v"), Seq(col("k").asc))
    assert(top.toDF.collect().map(_.getLong(0)).toSeq == Seq(2L, 4L))
    val plan = top.toDF.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("merge applies suffixes to overlaps and enforces validate") {
    val l = GFrame.fromDF(
      Seq((1L, "a", 10.0), (2L, "b", 20.0), (2L, "c", 30.0))
        .toDF("k", "nm", "v"), "k")
    val r = GFrame.fromDF(Seq((1L, "x"), (2L, "y")).toDF("k", "nm"), "k")
    val m = l.merge(r, Seq("k"), validate = Some("m:1"))
    assert(m.toDF.columns.toSeq.sorted == Seq("k", "nm_x", "nm_y", "v"))
    assert(m.toDF.count() == 3)
    // left side has duplicate k=2 → 1:m must reject
    intercept[IllegalArgumentException] {
      l.merge(r, Seq("k"), validate = Some("1:1"))
    }
  }

  test("crosstab drops null row keys (pandas drops NaN keys)") {
    val df = Seq((Some(1L), "x"), (None, "x"), (Some(1L), "y"))
      .toDF("rk", "c")
    val ct = GFrame.fromDF(df, "rk").crosstab("rk", "c", Seq("x", "y"))
    val rows = ct.toDF.collect()
    assert(rows.length == 1) // the null key never becomes a fabricated 0
    assert(rows(0).toSeq == Seq(1L, 1L, 1L))
  }

  test("mergeIndicator rejects indicator/marker column collisions") {
    val l = GFrame.fromDF(Seq((1L, "a")).toDF("k", "_merge"), "k")
    val r = GFrame.fromDF(Seq((1L, 9.0)).toDF("k", "rv"), "k")
    intercept[IllegalArgumentException] { l.mergeIndicator(r, Seq("k")) }
  }

  test("getDummies one-hot encodes explicit categories; null row all-zero") {
    val df = Seq((1L, Some("a")), (2L, Some("b")), (3L, None))
      .toDF("id", "cat")
    val d = GFrame.fromDF(df, "id").getDummies("cat", Seq("a", "b"), "c")
      .toDF.orderBy("id").collect()
    assert(d.map(r => (r.getInt(2), r.getInt(3))).toSeq
      == Seq((1, 0), (0, 1), (0, 0)))
  }

  test("corrMatrix stacks the upper triangle from one aggregate pass") {
    val df = Seq((1.0, 2.0), (2.0, 4.0), (3.0, 6.0)).toDF("x", "y")
    val m = GFrame.fromDF(df.withColumn("id", lit(1)), "id")
      .corrMatrix(Seq("x", "y")).toDF.orderBy("c1", "c2").collect()
    assert(m.length == 3)
    m.foreach(r => assert(math.abs(r.getDouble(2) - 1.0) < 1e-12))
  }

  test("welchTTest matches hand computation; tiny groups drop") {
    // g1: (1, 2, 3)  n=3 mu=2 s2=1;  g2: (2, 4, 6, 8)  n=4 mu=5 s2=20/3
    // g3: singleton → no sample variance → dropped from pairing
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 2.0),
      ("b", 4.0), ("b", 6.0), ("b", 8.0), ("c", 9.0)).toDF("g", "v")
    val out = GFrame.fromDF(df.withColumn("id", lit(1)), "id")
      .welchTTest("g", "v").toDF.orderBy("g1", "g2").collect()
    assert(out.length == 1)
    val r = out.head
    assert((r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))
      == (("a", "b", 3L, 4L)))
    val se2 = 1.0 / 3 + (20.0 / 3) / 4
    val t = (2.0 - 5.0) / math.sqrt(se2)
    val dfree = se2 * se2 /
      ((1.0 / 3) * (1.0 / 3) / 2 + ((20.0 / 3) / 4) * ((20.0 / 3) / 4) / 3)
    assert(math.abs(r.getDouble(4) - t) < 1e-6)
    assert(math.abs(r.getDouble(5) - dfree) < 1e-6)
  }

  test("skyline keeps exactly the non-dominated points") {
    // (1,5) frontier; (2,5) dominated (same y, worse x); (2,7) frontier;
    // (3,6) dominated by (2,7); (4,9) frontier; duplicate x keeps max y
    val df = Seq((1.0, 5), (2.0, 5), (2.0, 7), (3.0, 6), (4.0, 9),
      (4.0, 2)).toDF("x", "y")
    val out = GFrame.fromDF(df.withColumn("id", lit(1)), "id")
      .skyline("x", "y").toDF.orderBy("x").collect()
      .map(r => (r.getDouble(0), r.getInt(1))).toSeq
    assert(out == Seq((1.0, 5), (2.0, 7), (4.0, 9)))
    Caches.clear() // GlobalWindows persists its bucketed frame
  }

  test("weightedQuantile crosses at the running-weight threshold") {
    // group a: values 1,2,3 with weights 1,1,10 → total 12, half 6 →
    // crossing value is 3. Group b: uniform weights → plain lower median.
    val df = Seq(("a", 1.0, 1.0), ("a", 2.0, 1.0), ("a", 3.0, 10.0),
      ("b", 5.0, 1.0), ("b", 6.0, 1.0), ("b", 7.0, 1.0), ("b", 8.0, 1.0))
      .toDF("g", "v", "w")
    val out = GFrame.fromDF(df.withColumn("id", lit(1)), "id")
      .weightedQuantile("g", "v", "w", q = 0.5, tieCols = Nil)
      .toDF.orderBy("g").collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(out == Seq(("a", 3.0), ("b", 6.0)))
  }

  test("join on shared column names keeps one key copy") {
    val left = GFrame.fromDF(Seq((1L, "x"), (2L, "y")).toDF("id", "l"), "id")
    val right = GFrame.fromDF(Seq((1L, 9.0)).toDF("id", "r"), "id")
    val j = left.join(right, Seq("id"), "left")
    assert(j.columns == Seq("id", "l", "r"))
    assert(j.toDF.orderBy("id").collect().map(_.toSeq.toSeq).toSeq
      == Seq(Seq(1L, "x", 9.0), Seq(2L, "y", null)))
  }

  test("applyChanges: delete removes, update replaces, insert adds, " +
    "I-on-existing upserts, D-on-missing is a no-op") {
    val snap = GFrame.fromDF(
      Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("id", "v"), "id")
    val changes = Seq(
      (1L, 0.0, "D"),    // delete existing
      (2L, 25.0, "U"),   // update existing
      (4L, 40.0, "I"),   // insert new
      (3L, 35.0, "I"),   // 'I' on existing key: upsert, not duplicate
      (9L, 0.0, "D")     // delete of a missing key: no-op
    ).toDF("id", "v", "op")
    val out = snap.applyChanges(changes, "id", "op")
      .toDF.orderBy("id").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(out.toSeq == Seq((2L, 25.0), (3L, 35.0), (4L, 40.0)))
  }

  test("mannWhitney matches the naive all-pairs U and pandas-style z " +
    "on a hand corpus with ties") {
    // A = [1, 2, 2, 5], B = [2, 3, 3]
    val df = Seq(("A", 1.0), ("A", 2.0), ("A", 2.0), ("A", 5.0),
      ("B", 2.0), ("B", 3.0), ("B", 3.0)).toDF("g", "v")
    val r = GFrame.fromDF(df, "g").mannWhitney("g", "v", "A", "B")
      .toDF.head()
    Caches.clear()
    // naive U1 = #(a>b) + 0.5*#(a=b) over all 12 pairs:
    // a=1: 0; a=2 (x2): each 0.5 (ties with one b=2) => 1.0;
    // a=5: 3 => U1 = 4.0
    assert(r.getLong(0) == 4L && r.getLong(1) == 3L)
    assert(math.abs(r.getDouble(2) - 4.0) < 1e-12)
    // mu = 6, ties: t(2)=3 -> 24, t(3)=2 -> 6, t(1)=1,5 -> 0 => 30
    // sig2 = 12/12 * (8 - 30/(7*6)) = 8 - 5/7
    val sig2 = 8.0 - 30.0 / 42.0
    val z = (4.0 - 6.0) / math.sqrt(sig2)
    assert(math.abs(r.getDouble(3) - math.floor(z * 1e6 + 0.5) / 1e6)
      < 1e-9)
  }

  test("anovaF matches the hand computation on two integer groups") {
    // a = [1,2,3], b = [2,4,6]: SSB = 60/1e6·1e6−54 = 6, SSW = 10,
    // F = (6/1)/(10/4) = 2.4; means 2.0 / 4.0; df = (1, 4)
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 2.0), ("b", 4.0), ("b", 6.0)).toDF("g", "v")
    val out = GFrame.fromDF(df, "g").anovaF("g", "v")
      .toDF.orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4), r.getLong(5))).toSeq
    Caches.clear()
    assert(out == Seq(("a", 3L, 2.0, 2.4, 1L, 4L),
      ("b", 3L, 4.0, 2.4, 1L, 4L)))
  }
}
