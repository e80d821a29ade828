package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.core.Series

/** Property tests for the arithmetic laws (SURVEY §5 plan): floordiv =
  * floor(truediv), scalar-op linearity, rename idempotence, aggregation
  * invariance under value-preserving ops. Small generated vectors — the
  * laws are per-element, scale-independent. */
class PropertySpec extends AnyFunSuite with SparkFixture {

  import spark.implicits._

  /** Minimal deterministic property harness (the scalatest-scalacheck
    * bridge isn't on the offline classpath): sample `n` cases from the
    * generator with a fixed seed and run the assertion block on each. */
  private def forAll[A, B](ga: Gen[A], gb: Gen[B], n: Int = 20)(
      f: (A, B) => Unit): Unit = {
    var seed = Seed(42L)
    (1 to n).foreach { _ =>
      val a = ga.pureApply(Gen.Parameters.default, seed)
      val b = gb.pureApply(Gen.Parameters.default, seed.next)
      seed = seed.next.next
      f(a, b)
    }
  }
  private def forAll[A](ga: Gen[A], n: Int)(f: A => Unit): Unit =
    forAll(ga, Gen.const(()), n)((a, _) => f(a))

  private val vecGen: Gen[List[Double]] =
    Gen.nonEmptyListOf(Gen.choose(-1000.0, 1000.0))

  private def values(s: Series): Seq[Any] =
    s.df.orderBy(s.df(s.indexName)).collect().map(_.get(1)).toSeq

  test("compactCdc is associative: compact(compact(a) ∪ b) == " +
      "compact(a ∪ b) for arbitrary logs and splits (the p29 invariant)") {
    import graft.ops.PipelineOps
    // random multi-op logs over a small key space (forcing collisions),
    // with deliberately DUPLICATE seqs (the total struct order must
    // still compact deterministically)
    val rowGen = for {
      k <- Gen.choose(0L, 6L)
      seq <- Gen.choose(0L, 4L)
      op <- Gen.oneOf("U", "D")
      payload <- Gen.oneOf("a", "b", "c")
    } yield (k, payload, op, seq)
    val logGen = Gen.nonEmptyListOf(rowGen)
    forAll(logGen, Gen.choose(0, 100), n = 12) { (log, splitPct) =>
      val cut = log.length * splitPct / 100
      val (a, b) = log.splitAt(cut)
      def df(rows: List[(Long, String, String, Long)]) =
        rows.toDF("id", "s", "op", "seq")
      def rows(d: org.apache.spark.sql.DataFrame) =
        d.orderBy("id").collect()
          .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
      val whole = rows(PipelineOps.compactCdc(df(log), Seq("id"), "seq"))
      val staged =
        if (a.isEmpty) rows(PipelineOps.compactCdc(df(b), Seq("id"), "seq"))
        else rows(PipelineOps.compactCdc(
          PipelineOps.compactCdcWithSeq(df(a), Seq("id"), "seq")
            .unionByName(df(b)), Seq("id"), "seq"))
      assert(staged == whole,
        s"split at $cut diverged:\n  whole=$whole\n  staged=$staged")
    }
  }

  test("floorDiv(k) == floor(truediv k) for nonzero k") {
    forAll(vecGen, Gen.choose(1.0, 50.0)) { (xs: List[Double], k: Double) =>
      val s = Series.fromSeq(spark, xs)
      val lhs = values(s.floorDiv(k)).map(_.asInstanceOf[Long])
      val rhs = xs.map(x => math.floor(x / k).toLong)
      assert(lhs == rhs)
    }
  }

  test("(s + a) - a round-trips within 1 ulp-ish tolerance") {
    forAll(vecGen, Gen.choose(-100.0, 100.0)) { (xs: List[Double], a: Double) =>
      val s = Series.fromSeq(spark, xs)
      val back = values((s + a) - a).map(_.asInstanceOf[Double])
      assert(back.zip(xs).forall { case (b, x) => math.abs(b - x) <= 1e-9 * (math.abs(x) + 1) })
    }
  }

  test("rename is idempotent and last-write-wins") {
    forAll(Gen.identifier.suchThat(_.nonEmpty), 20) { (n: String) =>
      val s = Series.fromSeq(spark, Seq(1L, 2L)).rename(n).rename(n)
      assert(s.name == n && s.df.schema.names.contains(n))
    }
  }

  test("sum is invariant under index rename; mask(all-true) preserves sum") {
    forAll(vecGen, 20) { (xs: List[Double]) =>
      val s = Series.fromSeq(spark, xs)
      assert(s.renameIndex("other").sum() == s.sum())
      assert(s.where(_.isNotNull).sum() == s.sum())
    }
  }

  test("scalar multiply scales the sum linearly") {
    forAll(vecGen, Gen.choose(-10.0, 10.0)) { (xs: List[Double], k: Double) =>
      val s = Series.fromSeq(spark, xs)
      val scaled = (s * k).sum().asInstanceOf[Double]
      val direct = xs.map(_ * k).sum
      assert(math.abs(scaled - direct) <= 1e-6 * (math.abs(direct) + 1))
    }
  }

  test("operator results are invariant to shuffle-partition count") {
    // The determinism claim a 100 TB deployment rests on: the answer must
    // not depend on parallelism. Run representative shuffle-heavy ops at
    // 2 and 17 shuffle partitions and require identical sorted output
    // (integer/string outputs — exact equality, no float tolerance).
    import org.apache.spark.sql.functions._
    val docs = Seq.tabulate(40) { i =>
      (i.toLong, s"tok${i % 7} tok${(i * 3) % 5} tok${i % 7} tok${(i + 1) % 11} end")
    }.toDF("doc_id", "text")
    def run(): (Seq[String], Seq[String]) = {
      val pairs = graft.ops.DedupOps
        .jaccardPairs(docs, "doc_id", "text", n = 2, threshold = 0.3)
        .orderBy("id1", "id2").collect()
        .map(r => s"${r.getLong(0)}:${r.getLong(1)}").toSeq
      val lm = graft.ops.TextOps.lmScore(docs, "doc_id", "text")
        .orderBy("doc_id").collect()
        .map(r => f"${r.getLong(0)}:${r.getLong(1)}%d").toSeq
      graft.Caches.clear()
      (pairs, lm)
    }
    val saved = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "2")
      val lo = run()
      spark.conf.set("spark.sql.shuffle.partitions", "17")
      val hi = run()
      assert(lo == hi)
    } finally spark.conf.set("spark.sql.shuffle.partitions", saved)
  }

  test("cumsumDistributed == cumsum for arbitrary data and bucket counts") {
    forAll(vecGen, Gen.choose(1, 64), n = 15) { (xs: List[Double], b: Int) =>
      val s = Series.fromSeq(spark, xs)
      val seq = values(s.cumsum()).map(_.asInstanceOf[Double])
      val dist = values(s.cumsumDistributed(b)).map(_.asInstanceOf[Double])
      assert(seq.zip(dist).forall { case (a, d) =>
        math.abs(a - d) <= 1e-9 * (math.abs(a) + 1) }, s"buckets=$b")
    }
  }

  test("GlobalWindows family == sequential reference for arbitrary buckets/carry") {
    forAll(vecGen, Gen.choose(1, 40), n = 10) { (xs: List[Double], b: Int) =>
      val s = Series.fromSeq(spark, xs)
      val gw = s.globalWindows(buckets = b, carry = 2)
      val out = gw.result(
          "sh" -> gw.shift(2), "cmx" -> gw.cummax(),
          "r3" -> gw.rollingMean(3), "pos" -> gw.position(),
          "ff" -> gw.ffill())
        .orderBy("index").collect()
      val n = xs.length
      val shRef = (0 until n).map(i => if (i >= 2) Some(xs(i - 2)) else None)
      val cmxRef = xs.scanLeft(Double.NegativeInfinity)(math.max).tail
      val r3Ref = (0 until n).map(i =>
        if (i >= 2) Some((xs(i) + xs(i - 1) + xs(i - 2)) / 3.0) else None)
      out.zipWithIndex.foreach { case (r, i) =>
        assert((if (r.isNullAt(1)) None else Some(r.getDouble(1))) == shRef(i),
          s"shift@$i buckets=$b")
        assert(r.getDouble(2) == cmxRef(i), s"cummax@$i buckets=$b")
        val got = if (r.isNullAt(3)) None else Some(r.getDouble(3))
        (got, r3Ref(i)) match {
          case (Some(g), Some(e)) =>
            assert(math.abs(g - e) <= 1e-9 * (math.abs(e) + 1),
              s"rolling@$i buckets=$b")
          case (g, e) => assert(g == e, s"rolling-null@$i buckets=$b")
        }
        assert(r.getLong(4) == i + 1, s"position@$i buckets=$b")
        assert(r.getDouble(5) == xs(i), s"ffill@$i buckets=$b") // no nulls
      }
    }
  }

  test("balanced (quantile-bucket) windows == sequential for arbitrary data") {
    forAll(vecGen, Gen.choose(1, 64), n = 10) { (xs: List[Double], b: Int) =>
      val s = Series.fromSeq(spark, xs)
      val g = s.globalWindows(buckets = b, carry = 1, balanced = true)
      val out = g.result("c" -> g.cumsum(), "sh" -> g.shift(1))
        .orderBy("index").collect()
      val cumRef = xs.scanLeft(0.0)(_ + _).tail
      out.zipWithIndex.foreach { case (r, i) =>
        assert(math.abs(r.getDouble(1) - cumRef(i))
          <= 1e-9 * (math.abs(cumRef(i)) + 1), s"cumsum@$i buckets=$b")
        val shRef = if (i >= 1) Some(xs(i - 1)) else None
        assert((if (r.isNullAt(2)) None else Some(r.getDouble(2))) == shRef,
          s"shift@$i buckets=$b")
      }
    }
  }

  test("ImageCodec parse∘encode == identity for arbitrary dims/payloads") {
    import graft.ops.MultimodalOps.ImageCodec
    val dimGen = Gen.choose(1, 65535)
    val caseGen = for {
      w <- dimGen; h <- dimGen
      fr <- Gen.choose(0, 40)
      n <- Gen.choose(0, 2000)
      fmt <- Gen.oneOf("png", "gif", "jpeg", "webp")
    } yield (fmt, w, h, fr, n)
    forAll(caseGen, 60) { case (fmt, w, h, fr, n) =>
      val pl = Array.tabulate(n)(i => ((i * 31 + 7) % 256).toByte)
      val (bytes, expFrames) = fmt match {
        case "png"  => (ImageCodec.encodePng(w, h, pl), 1)
        case "gif"  => (ImageCodec.encodeGif(w, h, fr, pl), math.max(fr, 1))
        case "webp" => (ImageCodec.encodeWebp(w, h, pl), 1)
        case _      => (ImageCodec.encodeJpeg(w, h, pl), 1)
      }
      assert(ImageCodec.parse(bytes).contains(
        ImageCodec.Parsed(fmt, w, h, expFrames, n)),
        s"$fmt w=$w h=$h fr=$fr n=$n")
    }
  }

  test("ImageCodec.parse never throws on arbitrary bytes (fuzz)") {
    import graft.ops.MultimodalOps.ImageCodec
    val junkGen = for {
      n <- Gen.choose(0, 400)
      seed <- Gen.choose(Long.MinValue, Long.MaxValue)
    } yield (n, seed)
    forAll(junkGen, 200) { case (n, seed) =>
      val rnd = new scala.util.Random(seed)
      val b = Array.fill(n)(rnd.nextInt(256).toByte)
      ImageCodec.parse(b) // must return cleanly (Some or None), not throw
      // adversarial: valid magic + random tails (exercises every walker)
      val pngSig = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)
        .map(_.toByte)
      ImageCodec.parse(pngSig ++ b)
      ImageCodec.parse("GIF89a".getBytes("US-ASCII") ++ b)
      ImageCodec.parse(Array(0xFF.toByte, 0xD8.toByte) ++ b)
    }
  }

  test("packSequences == sequential greedy reference; budget invariants") {
    import graft.ops.PipelineOps
    import org.apache.spark.sql.functions.col
    val tokGen = Gen.nonEmptyListOf(Gen.choose(0L, 700L))
    forAll(tokGen, Gen.choose(1, 4), n = 10) { (toks: List[Long], sh: Int) =>
      val budget = 512L
      val df = toks.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "tok")
      val out = PipelineOps.packSequences(df, "doc_id", col("tok"),
          budget, shards = sh)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSeq
      assert(out.length == toks.length)
      // reference: per shard, greedy fold in doc_id order
      val byShard = out.groupBy(_._2)
      byShard.foreach { case (_, rows) =>
        var seq = 0L; var cum = 0L; var first = true
        rows.sortBy(_._1).foreach { case (id, _, sq, pos) =>
          val tok = toks(id.toInt)
          if (!first && cum > 0 && cum + tok > budget) { seq += 1; cum = 0 }
          first = false
          assert(sq == seq && pos == cum, s"doc $id")
          cum += tok
        }
      }
      // invariant: a sequence never exceeds the budget unless it holds a
      // single mega-doc (pos 0)
      out.groupBy(r => (r._2, r._3)).foreach { case (_, members) =>
        val total = members.map(r => toks(r._1.toInt)).sum
        assert(total <= budget || members.size == 1,
          s"overfull multi-doc sequence: $members")
      }
    }
  }

  test("GlobalWindows lead == sequential reference for arbitrary buckets") {
    forAll(vecGen, Gen.choose(1, 40), n = 10) { (xs: List[Double], b: Int) =>
      val s = Series.fromSeq(spark, xs)
      val gw = s.globalWindows(buckets = b, fcarry = 2)
      val out = gw.result("l1" -> gw.lead(1), "l2" -> gw.lead(2))
        .orderBy("index").collect()
      val n = xs.length
      out.zipWithIndex.foreach { case (r, i) =>
        val l1Ref = if (i + 1 < n) Some(xs(i + 1)) else None
        val l2Ref = if (i + 2 < n) Some(xs(i + 2)) else None
        assert((if (r.isNullAt(1)) None else Some(r.getDouble(1))) == l1Ref,
          s"lead1@$i buckets=$b")
        assert((if (r.isNullAt(2)) None else Some(r.getDouble(2))) == l2Ref,
          s"lead2@$i buckets=$b")
      }
    }
  }

  test("ntile: sizes differ by <= 1, tiles cover 1..min(k,n), monotone " +
    "in (value, index) order") {
    forAll(vecGen, Gen.choose(1, 7), 8) { (xs: List[Double], k: Int) =>
      val s = Series.fromSeq(spark, xs, name = "v")
      val rows = s.ntile(k).df.collect()
        .map(r => (r.getLong(0), r.getInt(1))).toSeq
      Caches.clear()
      val n = xs.length
      val byTile = rows.groupBy(_._2)
      assert(byTile.keySet == (1 to math.min(k, n)).toSet)
      val sizes = byTile.values.map(_.size)
      assert(sizes.max - sizes.min <= 1, s"sizes $sizes for n=$n k=$k")
      // tiles nondecreasing along the (value, index) sort order
      val tileOf = rows.toMap
      val sorted = xs.zipWithIndex.sortBy { case (v, i) => (v, i) }
      sorted.map { case (_, i) => tileOf(i.toLong) }
        .sliding(2).foreach {
          case Seq(a, b) => assert(a <= b)
          case _ => ()
        }
    }
  }

  test("sqQuantize: codes integral in [-127,127], reconstruction within " +
    "half a step, dot exact under the long cast") {
    import org.apache.spark.sql.functions._
    forAll(vecGen.suchThat(_.exists(_ != 0.0)), 10) { (xs: List[Double]) =>
      val df = Seq((1L, xs.map(_.toFloat).toArray)).toDF("id", "e")
      val sc = graft.ops.SimilarityOps.sqScale(df, "e")
      val q = graft.ops.SimilarityOps.sqQuantize(df, "id", "e", sc,
          "id", "qv")
        .head().getSeq[Double](1)
      q.zip(xs).foreach { case (c, x) =>
        assert(c == math.floor(c) && c >= -127 && c <= 127)
        // clamp only ever binds at |x| == sc (the max element itself)
        assert(math.abs(c / 127.0 * sc - x.toFloat.toDouble)
          <= sc / 127.0 / 2 + 1e-9)
      }
      // integer dot of codes is exactly representable (|dot| << 2^53)
      val dot = q.zip(q).map { case (a, b) => a * b }.sum
      assert(dot == math.rint(dot))
    }
  }

  test("aucBy is invariant under strictly monotone score transforms " +
    "and complements under label flip") {
    import org.apache.spark.sql.functions._
    val labGen = Gen.nonEmptyListOf(Gen.zip(Gen.oneOf(true, false),
      Gen.choose(-50, 50)))
    forAll(labGen.suchThat(l => l.exists(_._1) && l.exists(!_._1)), 10) {
      (rows: List[(Boolean, Int)]) =>
        val df = rows.map { case (l, v) => ("g", l, v.toDouble) }
          .toDF("g", "lab", "score")
        def auc(scoreCol: org.apache.spark.sql.Column): Double =
          graft.ops.EvalOps.aucBy(df, "g", col("lab"), scoreCol)
            .head().getDouble(3)
        val base = auc(col("score"))
        // AUC is a pure rank statistic: any strictly increasing
        // transform of the scores leaves it unchanged
        assert(auc(col("score") * 3.0 + 100.0) == base)
        // flipping the label complements it (ties keep the identity
        // exact: both sides count half)
        val flipped = graft.ops.EvalOps.aucBy(df, "g", !col("lab"),
          col("score")).head().getDouble(3)
        assert(math.abs(base + flipped - 1.0) < 2e-6)
    }
  }

  test("psi is antisymmetric-invariant: swapping the snapshots preserves " +
    "the total (the (p-q)ln(p/q) terms are symmetric)") {
    import org.apache.spark.sql.functions._
    val binsGen = Gen.nonEmptyListOf(Gen.choose(0, 5))
    forAll(binsGen, binsGen, 8) { (a: List[Int], b: List[Int]) =>
      val da = a.toDF("v"); val db = b.toDF("v")
      val t1 = graft.ops.EvalOps.psi(da, db, col("v"))
        .head().getDouble(4)
      val t2 = graft.ops.EvalOps.psi(db, da, col("v"))
        .head().getDouble(4)
      graft.Caches.clear()
      // per-bin terms are symmetric in the two snapshots up to the 6dp
      // floor grid (the floor can split a term across the swap by one
      // micro-unit per bin)
      assert(math.abs(t1 - t2) <= 1e-6 * (a ++ b).distinct.size + 1e-12)
    }
  }

  test("theilSen on exactly-linear data recovers the slope (the median " +
    "of identical pairwise slopes)") {
    import org.apache.spark.sql.functions._
    forAll(Gen.choose(-5.0, 5.0), Gen.choose(3, 10), 10) {
      (m0: Double, n: Int) =>
        val m = math.floor(m0 * 4) / 4 // dyadic slope → exact arithmetic
        val df = (0 until n).map(i => ("k", i.toLong, m * i))
          .toDF("k", "x", "y")
        val out = graft.ops.EventOps.theilSen(df, "k", "x", "y").head()
        graft.Caches.clear()
        assert(out.getLong(1) == n.toLong * (n - 1) / 2)
        assert(out.getDouble(2) == math.floor(m * 1e6 + 0.5) / 1e6)
    }
  }

  test("anovaF with two groups equals the pooled t-test squared " +
    "(textbook identity, exact on integer data)") {
    import org.apache.spark.sql.functions._
    val g = Gen.nonEmptyListOf(Gen.choose(1, 50)).suchThat(_.size >= 3)
      .suchThat(xs => xs.distinct.size > 1)
    forAll(g, g, 8) { (a: List[Int], b: List[Int]) =>
      val df = (a.map(("a", _)) ++ b.map(("b", _)))
        .map { case (k, v) => (k, v.toDouble) }.toDF("g", "v")
      val f = graft.core.GFrame.fromDF(df, "g").anovaF("g", "v")
        .toDF.head().getDouble(3)
      graft.Caches.clear()
      // pooled two-sample t on the same data
      val na = a.size.toDouble; val nb = b.size.toDouble
      val ma = a.sum / na; val mb = b.sum / nb
      val ssw = a.map(x => (x - ma) * (x - ma)).sum +
        b.map(x => (x - mb) * (x - mb)).sum
      val sp2 = ssw / (na + nb - 2)
      val t2 = (ma - mb) * (ma - mb) / (sp2 * (1 / na + 1 / nb))
      assert(math.abs(f - t2) < 1e-3 * (t2 + 1))
    }
  }

  test("jsdPairs is bounded by ln2 and zero for identical mixes") {
    import org.apache.spark.sql.functions._
    val toksGen = Gen.nonEmptyListOf(Gen.oneOf("a", "b", "c", "d"))
    forAll(toksGen, toksGen, 8) { (t1: List[String], t2: List[String]) =>
      val rows = t1.map(("g1", _)) ++ t2.map(("g2", _)) ++
        t1.map(("g3", _)) // g3 duplicates g1's mix exactly
      val df = rows.toDF("g", "tok")
      val out = graft.ops.EvalOps.jsdPairs(df, "g", col("tok"))
        .collect().map(r => (r.getString(0), r.getString(1)) ->
          r.getDouble(3)).toMap
      graft.Caches.clear()
      out.values.foreach(j => assert(j >= -1e-6 && j <= 0.693148))
      assert(math.abs(out(("g1", "g3"))) <= 1e-6)
    }
  }

  test("kaplanMeier survival is monotone non-increasing in [0, 1]") {
    import java.sql.Timestamp
    forAll(Gen.nonEmptyListOf(Gen.choose(0, 500)), 8) { (offs: List[Int]) =>
      val rows = offs.zipWithIndex.flatMap { case (o, i) =>
        Seq((i.toLong, Timestamp.valueOf("2024-01-01 00:00:00")),
          (i.toLong, new Timestamp(
            Timestamp.valueOf("2024-01-01 00:00:00").getTime
              + o.toLong * 3600000L)))
      }
      val df = rows.toDF("u", "ts")
      val s6 = graft.ops.EventOps.kaplanMeier(df, Seq("u"), "ts",
          gapUnits = 24, unitUs = 3600000000L)
        .orderBy("t").collect().map(_.getDouble(4)).toSeq
      graft.Caches.clear()
      assert(s6.forall(v => v >= -1e-9 && v <= 1.0 + 1e-9))
      assert(s6.zip(s6.drop(1)).forall { case (x, y) => y <= x + 1e-9 })
    }
  }

  test("FlacCodec parse∘encode == identity; parse never throws on junk") {
    import graft.ops.MultimodalOps.FlacCodec
    val caseGen = for {
      sr <- Gen.choose(1, (1 << 20) - 1)
      ch <- Gen.choose(1, 8)
      bps <- Gen.choose(1, 32)
      ns <- Gen.choose(0L, (1L << 36) - 1)
      n <- Gen.choose(0, 1500)
    } yield (sr, ch, bps, ns, n)
    forAll(caseGen, 60) { case (sr, ch, bps, ns, n) =>
      val pl = Array.tabulate(n)(i => ((i * 17 + 3) % 256).toByte)
      assert(FlacCodec.parse(FlacCodec.encodeFlac(sr, ch, bps, ns, pl))
        .contains(FlacCodec.FlacParsed(sr, ch, bps, ns, n)),
        s"sr=$sr ch=$ch bps=$bps ns=$ns n=$n")
    }
    val junkGen = for {
      n <- Gen.choose(0, 300)
      seed <- Gen.choose(Long.MinValue, Long.MaxValue)
    } yield (n, seed)
    forAll(junkGen, 150) { case (n, seed) =>
      val rnd = new scala.util.Random(seed)
      val b = Array.fill(n)(rnd.nextInt(256).toByte)
      FlacCodec.parse(b) // Some or None, never a throw
      FlacCodec.parse("fLaC".getBytes("US-ASCII") ++ b)
    }
  }

  test("snapshotDiff matches a sequential set-algebra reference") {
    import graft.ops.PipelineOps
    val corpusGen = for {
      nb <- Gen.choose(1, 30)
      na <- Gen.choose(1, 30)
      flip <- Gen.choose(1, 5)
    } yield (nb, na, flip)
    forAll(corpusGen, 12) { case (nb, na, flip) =>
      val before = (0 until nb).map(i => (i.toLong, s"text$i"))
      val after = (0 until na).map(i =>
        (i.toLong, if (i % flip == 0) s"text$i changed" else s"text$i"))
      val got = PipelineOps.snapshotDiff(
          before.toDF("doc_id", "text"), after.toDF("doc_id", "text"),
          "doc_id", "text")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val bm = before.toMap; val am = after.toMap
      val exp = (bm.keySet ++ am.keySet).map { id =>
        id -> ((bm.get(id), am.get(id)) match {
          case (None, Some(_)) => "added"
          case (Some(_), None) => "removed"
          case (Some(x), Some(y)) if x == y => "unchanged"
          case _ => "changed"
        })
      }.toMap
      assert(got == exp)
    }
  }

  test("kfold: folds cover [0,k), deterministic, independent of cohort") {
    import graft.ops.PipelineOps
    import org.apache.spark.sql.functions.col
    forAll(Gen.choose(2, 9), Gen.choose(20, 120)) { (k: Int, n: Int) =>
      val df = (0 until n).map(_.toLong).toDF("id")
      val f1 = PipelineOps.kfold(df, "id", k)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(f1.values.forall(f => f >= 0 && f < k))
      // determinism + independence: the same id in a DIFFERENT corpus
      // slice lands in the same fold (leakage-free by id)
      val f2 = PipelineOps.kfold(df.filter(col("id") % 2 === 0), "id", k)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(f2.forall { case (id, f) => f1(id) == f })
    }
  }

  test("topNgramShare: share in (0,1], 1 exactly when one n-gram repeats") {
    import graft.ops.TextOps
    val wordGen = Gen.oneOf("alpha", "beta", "gamma", "delta")
    val docGen = Gen.nonEmptyListOf(wordGen).map(_.take(30))
    forAll(Gen.nonEmptyListOf(docGen).map(_.take(8)), 10) {
      (docs: List[List[String]]) =>
        val df = docs.zipWithIndex
          .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
          .toDF("doc_id", "text")
        val got = TextOps.topNgramShare(df, "doc_id", "text", 2)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getDouble(3)))
        graft.Caches.clear()
        got.foreach { case (id, nG, top, share) =>
          val ws = docs(id.toInt)
          val grams = ws.sliding(2).filter(_.size == 2).map(_.mkString(" "))
            .toList
          assert(nG == grams.size && top == grams.groupBy(identity)
            .values.map(_.size).max)
          assert(share > 0 && share <= 1.0)
          assert((share == 1.0) == (grams.distinct.size == 1))
        }
        // docs with < 2 tokens drop
        assert(got.length == docs.count(_.size >= 2))
    }
  }

  test("mcc is ±1 on perfect agreement/disagreement and bounded") {
    import org.apache.spark.sql.functions._
    val g = Gen.nonEmptyListOf(Gen.oneOf(true, false))
      .suchThat(xs => xs.contains(true) && xs.contains(false))
    forAll(g, 8) { (labs: List[Boolean]) =>
      val df = labs.toDF("l")
      val same = graft.ops.EvalOps.mcc(df, col("l"), col("l"))
        .head().getDouble(4)
      val opp = graft.ops.EvalOps.mcc(df, col("l"), !col("l"))
        .head().getDouble(4)
      assert(same == 1.0 && opp == -1.0)
    }
  }
}
