package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.Series
import graft.ops.PipelineOps

/** Expanding corr/cov, rolling skew/kurt (sample-moment conversions),
  * keyed range windows, and deterministic weighted sampling —
  * differential tests against brute-force single-machine oracles. */
class MomentsSpec extends AnyFunSuite with SparkFixture {

  import spark.implicits._

  private val xs = (1 to 40).map(i => i.toDouble + (i % 7))
  private val ys = (1 to 40).map(i => (i * i).toDouble % 13)

  private def bruteCorr(wx: Seq[Double], wy: Seq[Double]): Double = {
    val n = wx.size
    val mx = wx.sum / n; val my = wy.sum / n
    val cov = wx.zip(wy).map { case (a, b) => (a - mx) * (b - my) }.sum
    cov / math.sqrt(wx.map(a => (a - mx) * (a - mx)).sum *
      wy.map(b => (b - my) * (b - my)).sum)
  }

  test("expandingCorr/expandingCov same-base match brute force") {
    val df = (1 to 40).map(i => (i.toLong, xs(i - 1), ys(i - 1)))
      .toDF("idx", "x", "y")
    val sx = Series.fromColumn(df, "x", "idx")
    val sy = Series.fromColumn(df, "y", "idx")
    val gc = sx.expandingCorr(sy).df.orderBy("idx").collect()
    val gv = sx.expandingCov(sy).df.orderBy("idx").collect()
    assert(gc.head.isNullAt(1) && gv.head.isNullAt(1)) // n=1 → null
    (2 to 40).foreach { i =>
      val wx = xs.take(i); val wy = ys.take(i)
      assert(math.abs(gc(i - 1).getDouble(1) - bruteCorr(wx, wy)) < 1e-9,
        s"corr at $i")
      val mx = wx.sum / i; val my = wy.sum / i
      val cov = wx.zip(wy).map { case (a, b) => (a - mx) * (b - my) }.sum /
        (i - 1)
      assert(math.abs(gv(i - 1).getDouble(1) - cov) < 1e-9, s"cov at $i")
    }
  }

  test("expandingCorr aligns cross-frame Series by label; pairwise drops") {
    val a = Series.fromColumn(
      (1L to 20L).map(i => (i, i.toDouble)).toDF("k", "a"), "a", "k")
    // b is missing labels 3 and 7 → those rows never form a pair
    val b = Series.fromColumn(
      (1L to 20L).filterNot(i => i == 3 || i == 7)
        .map(i => (i, 2 * i + 1.0)).toDF("k", "b"), "b", "k")
    val got = a.expandingCorr(b).df.orderBy("k").collect()
    // perfectly linear → corr = 1 once ≥ 2 pairs exist
    got.drop(1).filterNot(_.isNullAt(1))
      .foreach(r => assert(math.abs(r.getDouble(1) - 1.0) < 1e-9))
    assert(got.head.isNullAt(1))
    // rows 3 and 7 still appear (left labels) with the prefix value
    assert(got.length == 20)
  }

  test("expandingCorrBy partitions by the key") {
    val df = (1L to 30L).map { i =>
      (i, i % 3, i.toDouble, if (i % 3 == 0) -i.toDouble else i.toDouble)
    }.toDF("idx", "g", "x", "y")
    val sx = Series.fromColumn(df, "x", "idx")
    val sy = Series.fromColumn(df, "y", "idx")
    val got = sx.expandingCorrBy(col("g"), sy).df.orderBy("idx").collect()
    got.filter(!_.isNullAt(1)).foreach { r =>
      val exp = if (r.getLong(0) % 3 == 0) -1.0 else 1.0
      assert(math.abs(r.getDouble(1) - exp) < 1e-9, s"at ${r.getLong(0)}")
    }
  }

  private def bruteSkew(w: Seq[Double]): Double = {
    val n = w.size; val m = w.sum / n
    val m2 = w.map(x => math.pow(x - m, 2)).sum / n
    val m3 = w.map(x => math.pow(x - m, 3)).sum / n
    (m3 / math.pow(m2, 1.5)) * math.sqrt(n.toDouble * (n - 1)) / (n - 2)
  }

  private def bruteKurt(w: Seq[Double]): Double = {
    val n = w.size; val m = w.sum / n
    val m2 = w.map(x => math.pow(x - m, 2)).sum / n
    val m4 = w.map(x => math.pow(x - m, 4)).sum / n
    val g2 = m4 / (m2 * m2) - 3
    ((n + 1) * g2 + 6) * (n - 1.0) / ((n - 2.0) * (n - 3.0))
  }

  test("rollingSkew/rollingKurt match the pandas sample formulas") {
    val df = (1 to 40).map(i => (i.toLong, xs(i - 1))).toDF("idx", "x")
    val s = Series.fromColumn(df, "x", "idx")
    val n = 7
    val sk = s.rollingSkew(n).df.orderBy("idx").collect()
    val kt = s.rollingKurt(n).df.orderBy("idx").collect()
    (1 to 40).foreach { i =>
      if (i < n) {
        assert(sk(i - 1).isNullAt(1)); assert(kt(i - 1).isNullAt(1))
      } else {
        val w = xs.slice(i - n, i)
        assert(math.abs(sk(i - 1).getDouble(1) - bruteSkew(w)) < 1e-9,
          s"skew at $i")
        assert(math.abs(kt(i - 1).getDouble(1) - bruteKurt(w)) < 1e-9,
          s"kurt at $i")
      }
    }
  }

  test("rollingSkewBy/rollingKurtBy partition by the key") {
    val df = (1 to 40).map(i => (i.toLong, i % 2, xs(i - 1)))
      .toDF("idx", "g", "x")
    val s = Series.fromColumn(df, "x", "idx")
    val got = s.rollingSkewBy(col("g"), 5).df.orderBy("idx").collect()
    val byParity = (0 to 1).map(p =>
      p -> (1 to 40).filter(_ % 2 == p).map(i => xs(i - 1))).toMap
    (1 to 40).foreach { i =>
      val grp = byParity(i % 2)
      val rank = (1 to 40).filter(_ % 2 == i % 2).indexOf(i)
      if (rank < 4) assert(got(i - 1).isNullAt(1), s"at $i")
      else {
        val w = grp.slice(rank - 4, rank + 1)
        assert(math.abs(got(i - 1).getDouble(1) - bruteSkew(w)) < 1e-9,
          s"at $i")
      }
    }
  }

  test("rollingRangeMeanBy: per-key time-span frames, brute force") {
    val rows = Seq(
      (1L, "a", 0L, 1.0), (2L, "a", 5L, 2.0), (3L, "a", 14L, 4.0),
      (4L, "b", 1L, 8.0), (5L, "b", 9L, 16.0), (6L, "b", 30L, 32.0))
    val df = rows.toDF("id", "g", "t", "v")
    val s = Series.fromExpr(df, col("v"), "v", col("t"), "t")
    val got = s.rollingRangeMeanBy(col("g"), span = 10L).df
      .orderBy("t", "v").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val exp = rows.map { case (_, g, t, _) =>
      val in = rows.filter { case (_, g2, t2, _) =>
        g2 == g && t2 > t - 10L && t2 <= t }
      (t, in.map(_._4).sum / in.size)
    }.sortBy(r => (r._1, r._2))
    assert(got.toSeq == exp)
  }

  test("reindex: exact / ffill / bfill onto a distributed label set") {
    val obs = Seq((10L, 1.0), (20L, 2.0), (30L, 3.0)).toDF("k", "v")
    val s = Series.fromColumn(obs, "v", "k")
    val labels = Seq(5L, 10L, 25L, 40L).toDF("lbl")
    def out(m: Option[String]): Map[Long, Option[Double]] =
      s.reindex(labels, m).df.collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None
          else Some(r.getDouble(1)))).toMap
    assert(out(None) == Map(5L -> None, 10L -> Some(1.0), 25L -> None,
      40L -> None))
    assert(out(Some("ffill")) == Map(5L -> None, 10L -> Some(1.0),
      25L -> Some(2.0), 40L -> Some(3.0)))
    assert(out(Some("bfill")) == Map(5L -> Some(1.0), 10L -> Some(1.0),
      25L -> Some(3.0), 40L -> None))
  }

  test("weightedSample: deterministic, right-sized, weight-responsive") {
    val df = (1L to 1000L).map(i => (i, if (i <= 10) 1000.0 else 1.0))
      .toDF("id", "w")
    val s1 = PipelineOps.weightedSample(df, "id", col("w"), 100, "t")
      .select("id").as[Long].collect().toSet
    val s2 = PipelineOps.weightedSample(df, "id", col("w"), 100, "t")
      .select("id").as[Long].collect().toSet
    assert(s1 == s2) // deterministic
    assert(s1.size == 100)
    // the 10 heavy rows carry 1000× odds: expect (essentially) all present
    assert((1L to 10L).count(s1.contains) >= 9)
    // a different salt draws a different sample
    val s3 = PipelineOps.weightedSample(df, "id", col("w"), 100, "u")
      .select("id").as[Long].collect().toSet
    assert(s1 != s3)
    // zero/negative weights are excluded
    val z = PipelineOps.weightedSample(
      (1L to 20L).map(i => (i, if (i % 2 == 0) 0.0 else 1.0)).toDF("id", "w"),
      "id", col("w"), 20, "t").select("id").as[Long].collect().toSet
    assert(z == (1L to 20L).filter(_ % 2 == 1).toSet)
  }

  /** Sequential pandas recurrence oracle — validated cell-by-cell against
    * real pandas ewm().cov(bias=False)/.corr() for both ignore_na modes. */
  private def bruteEwmPair(xs: Seq[Option[Double]], ys: Seq[Option[Double]],
      alpha: Double, ina: Boolean): Seq[(Option[Double], Option[Double])] = {
    val w = 1 - alpha
    var sw, sw2, sx, sy, sxy, sx2, sy2 = 0.0
    xs.indices.map { i =>
      val valid = xs(i).isDefined && ys(i).isDefined
      if (!ina || valid) {
        sw *= w; sw2 *= w * w
        sx *= w; sy *= w; sxy *= w; sx2 *= w; sy2 *= w
      }
      if (valid) {
        val x = xs(i).get; val y = ys(i).get
        sw += 1; sw2 += 1
        sx += x; sy += y; sxy += x * y; sx2 += x * x; sy2 += y * y
      }
      val num = sxy * sw - sx * sy
      val covDen = sw * sw - sw2
      val d2 = (sx2 * sw - sx * sx) * (sy2 * sw - sy * sy)
      (if (covDen > 0) Some(num / covDen) else None,
        if (covDen > 0 && d2 > 0) Some(num / math.sqrt(d2)) else None)
    }
  }

  for (ina <- Seq(false, true)) {
    test(s"ewmPairStats matches the pandas recurrence (ignore_na=$ina)") {
      val xs = (1 to 50).map(i =>
        if (i % 11 == 0) None else Some(i.toDouble + (i % 7)))
      val ys = (1 to 50).map(i =>
        if (i % 13 == 0) None else Some((i * i).toDouble % 17))
      val df = (1 to 50).map(i => (i.toLong, xs(i - 1), ys(i - 1)))
        .toDF("idx", "x", "y")
      val sx = Series.fromColumn(df, "x", "idx")
      val sy = Series.fromColumn(df, "y", "idx")
      // buckets=8 on 50 rows forces the cross-bucket carry folds
      val got = sx.ewmPairStats(sy, 0.3, buckets = 8, ignoreNa = ina)
        .orderBy("idx").collect()
      val exp = bruteEwmPair(xs, ys, 0.3, ina)
      (1 to 50).foreach { i =>
        val (ec, er) = exp(i - 1)
        val r = got(i - 1)
        assert(r.isNullAt(1) == ec.isEmpty, s"cov null at $i")
        assert(r.isNullAt(2) == er.isEmpty, s"corr null at $i")
        ec.foreach(v => assert(math.abs(r.getDouble(1) - v) < 1e-9,
          s"cov at $i"))
        er.foreach(v => assert(math.abs(r.getDouble(2) - v) < 1e-9,
          s"corr at $i"))
      }
    }
  }

  test("ewmCov/ewmCorr align cross-frame Series by label") {
    val a = Series.fromColumn(
      (1L to 25L).map(i => (i, i.toDouble)).toDF("k", "a"), "a", "k")
    val b = Series.fromColumn(
      (1L to 25L).map(i => (i, 3 * i + 2.0)).toDF("k", "b"), "b", "k")
    val got = a.ewmCorr(b, 0.2).df.orderBy("k").collect()
    // perfectly linear → corr = 1 wherever defined
    got.drop(1).foreach(r => assert(math.abs(r.getDouble(1) - 1.0) < 1e-9))
    assert(got.head.isNullAt(1))
  }

  test("ewmPairStatsBy runs the recurrence independently per key") {
    val df = (1 to 40).map(i =>
      (i.toLong, i % 3, xs(i - 1), ys(i - 1))).toDF("idx", "g", "x", "y")
    val sx = Series.fromColumn(df, "x", "idx")
    val sy = Series.fromColumn(df, "y", "idx")
    val got = sx.ewmPairStatsBy(col("g"), sy, 0.3)
      .orderBy("idx").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(2)) None
        else Some(r.getDouble(2)))).toMap
    (0 to 2).foreach { g =>
      val ids = (1 to 40).filter(_ % 3 == g)
      val exp = bruteEwmPair(ids.map(i => Some(xs(i - 1))),
        ids.map(i => Some(ys(i - 1))), 0.3, ina = false)
      ids.zipWithIndex.foreach { case (i, k) =>
        val (ec, _) = exp(k)
        assert(got(i.toLong).isDefined == ec.isDefined, s"at $i")
        ec.foreach(v => assert(math.abs(got(i.toLong).get - v) < 1e-9,
          s"cov at $i"))
      }
    }
  }

  test("linFitBy recovers per-group OLS; degenerate groups null") {
    // g=0: y = 2x + 3 exactly; g=1: y = -x + 5 plus deterministic noise;
    // g=2: a single point (degenerate → null slope/r2)
    val rows =
      (1 to 10).map(i => (0, i.toDouble, 2 * i + 3.0)) ++
        (1 to 10).map(i => (1, i.toDouble, -i + 5.0 + (i % 3) * 0.1)) ++
        Seq((2, 1.0, 1.0))
    val df = rows.toDF("g", "x", "y")
    val got = graft.core.GFrame.fromDF(df, "g")
      .linFitBy(Seq("g"), col("x"), col("y")).toDF
      .orderBy("g").collect()
    assert(math.abs(got(0).getDouble(2) - 2.0) < 1e-9)
    assert(math.abs(got(0).getDouble(3) - 3.0) < 1e-9)
    assert(math.abs(got(0).getDouble(4) - 1.0) < 1e-9)
    // brute force for g=1
    val (xs1, ys1) = ((1 to 10).map(_.toDouble),
      (1 to 10).map(i => -i + 5.0 + (i % 3) * 0.1))
    val n = 10.0
    val num = n * xs1.zip(ys1).map { case (a, b) => a * b }.sum -
      xs1.sum * ys1.sum
    val dx = n * xs1.map(a => a * a).sum - xs1.sum * xs1.sum
    val dy = n * ys1.map(b => b * b).sum - ys1.sum * ys1.sum
    assert(math.abs(got(1).getDouble(2) - num / dx) < 1e-9)
    assert(math.abs(got(1).getDouble(4) - num * num / (dx * dy)) < 1e-9)
    assert(got(2).isNullAt(2) && got(2).isNullAt(4)) // single point
    assert(got(2).getLong(1) == 1L)
  }

  test("weightedSample plans as TakeOrderedAndProject (no corpus shuffle)") {
    val df = (1L to 1000L).map(i => (i, i.toDouble)).toDF("id", "w")
    val plan = PipelineOps.weightedSample(df, "id", col("w"), 10, "t")
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }
}
