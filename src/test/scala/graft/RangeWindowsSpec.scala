package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.Series

/** RangeWindows (time/range-span rolling) + pairwise rolling corr/cov:
  * differential tests against brute-force single-machine oracles, with
  * bucket counts forced high so every cross-bucket replication path is
  * exercised on tiny data. */
class RangeWindowsSpec extends AnyFunSuite with SparkFixture {

  import spark.implicits._

  // irregular integer coordinates with gaps, duplicates absent; values
  // chosen so every frame has a distinct exact mean
  private val pts: Seq[(Long, Double)] = Seq(
    0L -> 1.0, 3L -> 2.0, 4L -> 4.0, 9L -> 8.0, 10L -> 16.0,
    11L -> 32.0, 25L -> 64.0, 26L -> 128.0, 40L -> 256.0)

  private def mk(buckets: Int): (Series, Int) = {
    val df = pts.toDF("idx", "v")
    (Series.fromColumn(df, "v", "idx"), buckets)
  }

  /** Brute-force pandas closed='right' oracle: mean over (t-span, t]. */
  private def oracle(span: Long): Map[Long, (Double, Long)] =
    pts.map { case (t, _) =>
      val in = pts.filter { case (u, _) => u > t - span && u <= t }
      t -> (in.map(_._2).sum / in.size, in.size.toLong)
    }.toMap

  for (buckets <- Seq(1, 4, 32)) {
    test(s"rollingRange mean/count match brute force (buckets=$buckets)") {
      val (s, b) = mk(buckets)
      val r = s.rangeWindows(span = 10L, buckets = b)
      val got = r.result("m" -> r.mean(), "n" -> r.count())
        .collect().map(row => row.getLong(0) ->
          (row.getDouble(1), row.getLong(2))).toMap
      val exp = oracle(10L)
      assert(got.keySet == exp.keySet)
      exp.foreach { case (t, (m, n)) =>
        assert(got(t)._2 == n, s"count at $t")
        assert(math.abs(got(t)._1 - m) < 1e-12, s"mean at $t")
      }
    }
  }

  test("span wider than the range degrades to one bucket, stays exact") {
    val (s, _) = mk(32)
    val r = s.rangeWindows(span = 1000L, buckets = 32)
    val got = r.result("n" -> r.count()).collect()
      .map(row => row.getLong(0) -> row.getLong(1)).toMap
    // span covers everything: each row sees all rows at or before it
    pts.zipWithIndex.foreach { case ((t, _), i) =>
      assert(got(t) == i + 1L)
    }
  }

  test("min/max/sum/std over the span match brute force") {
    val (s, _) = mk(4)
    val r = s.rangeWindows(span = 7L, buckets = 4)
    val got = r.result("mn" -> r.min(), "mx" -> r.max(),
        "sm" -> r.sum(), "sd" -> r.std())
      .collect().map(row => row.getLong(0) -> row).toMap
    pts.foreach { case (t, _) =>
      val in = pts.filter { case (u, _) => u > t - 7L && u <= t }.map(_._2)
      assert(got(t).getDouble(1) == in.min, s"min at $t")
      assert(got(t).getDouble(2) == in.max, s"max at $t")
      assert(math.abs(got(t).getDouble(3) - in.sum) < 1e-12, s"sum at $t")
      if (in.size < 2) assert(got(t).isNullAt(4), s"std at $t")
      else {
        val m = in.sum / in.size
        val sd = math.sqrt(in.map(x => (x - m) * (x - m)).sum / (in.size - 1))
        assert(math.abs(got(t).getDouble(4) - sd) < 1e-12, s"std at $t")
      }
    }
  }

  test("timestamp index: 1h trailing count on a µs coordinate") {
    val base = java.time.Instant.parse("2024-01-01T00:00:00Z")
    val rows = Seq(0L, 10L, 59L, 60L, 61L, 150L).map { mins =>
      (java.sql.Timestamp.from(base.plusSeconds(mins * 60)), 1.0)
    }
    val s = Series.fromColumn(rows.toDF("t", "v"), "v", "t")
    val r = s.rangeWindows(span = 3600L * 1000000L, buckets = 8)
    val got = r.result("n" -> r.count())
      .orderBy("t").collect().map(_.getLong(1)).toSeq
    // closed='right': (t-1h, t] — the 60-min row still sees the 0-min row
    // dropped (exactly 1h before => excluded boundary is t-1h itself,
    // which IS included only when strictly inside (t-1h, t] — 0 min is
    // exactly t-1h, excluded)
    assert(got == Seq(1L, 2L, 3L, 3L, 4L, 1L))
  }

  test("null index labels yield null results without feeding any frame") {
    val df = Seq[(Option[Long], Double)](
      (Some(1L), 10.0), (None, 99.0), (Some(2L), 20.0))
      .toDF("idx", "v")
    val s = Series.fromColumn(df, "v", "idx")
    val r = s.rangeWindows(span = 5L, buckets = 4)
    val rows = r.result("m" -> r.mean()).collect()
    val byIdx = rows.filter(!_.isNullAt(0))
      .map(row => row.getLong(0) -> row.getDouble(1)).toMap
    assert(byIdx(1L) == 10.0)
    assert(byIdx(2L) == 15.0) // 99.0 never contributes
    assert(rows.exists(row => row.isNullAt(0) && row.isNullAt(1)))
  }

  test("rollingCorr/rollingCov same-base match brute force") {
    val df = (1L to 30L).map(i =>
      (i, i.toDouble + (i % 7), (i * i).toDouble % 13)).toDF("idx", "x", "y")
    val sx = Series.fromColumn(df, "x", "idx")
    val sy = Series.fromColumn(df, "y", "idx")
    val n = 5
    val got = sx.rollingCorr(sy, n).df.orderBy("idx").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None
        else Some(r.getDouble(1)))).toMap
    val xs = (1L to 30L).map(i => i.toDouble + (i % 7))
    val ys = (1L to 30L).map(i => (i * i).toDouble % 13)
    (1 to 30).foreach { i =>
      if (i < n) assert(got(i.toLong).isEmpty, s"corr at $i")
      else {
        val wx = xs.slice(i - n, i)
        val wy = ys.slice(i - n, i)
        val mx = wx.sum / n; val my = wy.sum / n
        val cov = wx.zip(wy).map { case (a, b) => (a - mx) * (b - my) }.sum
        val corr = cov / math.sqrt(
          wx.map(a => (a - mx) * (a - mx)).sum *
            wy.map(b => (b - my) * (b - my)).sum)
        assert(math.abs(got(i.toLong).get - corr) < 1e-9, s"corr at $i")
      }
    }
    // cov spot check (sample covariance, ddof=1)
    val cv = sx.rollingCov(sy, n).df.orderBy("idx").collect()
    val wx = xs.slice(25, 30); val wy = ys.slice(25, 30)
    val mx = wx.sum / n; val my = wy.sum / n
    val expCov = wx.zip(wy).map { case (a, b) => (a - mx) * (b - my) }.sum /
      (n - 1)
    assert(math.abs(cv.last.getDouble(1) - expCov) < 1e-9)
  }

  test("rollingCorr aligns cross-frame Series by label") {
    val a = Series.fromColumn(
      (1L to 20L).map(i => (i, i.toDouble)).toDF("k", "a"), "a", "k")
    val b = Series.fromColumn(
      (1L to 20L).map(i => (i, (21 - i).toDouble)).toDF("k", "b"), "b", "k")
    val got = a.rollingCorr(b, 4).df.orderBy("k").collect()
    // perfectly anti-correlated → corr = -1 once the frame fills
    got.drop(3).foreach(r => assert(math.abs(r.getDouble(1) + 1.0) < 1e-9))
    got.take(3).foreach(r => assert(r.isNullAt(1)))
  }

  test("keyed rollingCorrBy partitions by the key") {
    val df = (1L to 40L).map { i =>
      (i, i % 2, i.toDouble, if (i % 2 == 0) i.toDouble else -i.toDouble)
    }.toDF("idx", "g", "x", "y")
    val sx = Series.fromColumn(df, "x", "idx")
    val sy = Series.fromColumn(df, "y", "idx")
    val got = sx.rollingCorrBy(col("g"), sy, 3).df.orderBy("idx").collect()
    // within each parity group x and y are perfectly (anti-)correlated
    got.filter(!_.isNullAt(1)).foreach { r =>
      val even = r.getLong(0) % 2 == 0
      assert(math.abs(r.getDouble(1) - (if (even) 1.0 else -1.0)) < 1e-9)
    }
  }
}
