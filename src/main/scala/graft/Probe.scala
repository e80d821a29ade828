package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Step-level timing probe for the expensive gates (guide §1: measure
  * first, attribute to the exact sub-step). NOT part of the bench or
  * verify surface — a scratch main for the optimization rounds:
  *
  *   sbt "runMain graft.Probe substr /root/testdata/sf0.1"
  *   sbt "runMain graft.Probe louvain /root/testdata/sf0.1"
  *
  * Each probe replicates a gate's body with an explicit action per
  * step, prints per-step seconds for a warm-up pass plus 2 timed
  * passes, and labels jobs so the UI/event-log attribution matches. */
object Probe {

  private def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[probe] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val what = args.headOption.getOrElse("substr")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
      "graft-probe")
    spark.sparkContext.setLogLevel("ERROR")
    (1 to 3).foreach { pass =>
      println(s"[probe] ===== pass $pass =====")
      what match {
        case "substr" => substr(spark, sfDir)
        case "substr_incr" => substrIncr(spark, sfDir)
        case "substr_incr_deep" => substrIncrDeep(spark, sfDir)
        case "louvain" => louvain(spark, sfDir)
        case "louvain_plan" => louvainPlan(spark, sfDir)
        case "ivfpq" => ivfpq(spark, sfDir)
        case other => sys.error(s"unknown probe: $other")
      }
      Caches.clear()
    }
    spark.stop()
  }

  /** d49 batch ExactSubstr, step by step. */
  private def substr(s: SparkSession, d: String): Unit = {
    import graft.ops.{DedupOps, TextOps}
    val docs = Tables.documents(s, d)
    val k = 50
    val base = t("base persist (gram text + tokens)") {
      val b = graft.Caches.track(
        DedupOps.spread(docs.select(col("doc_id").as("id"),
            col("text").as("__txt")), "id")
          .select(col("id"),
            graft.functions.NgramText.ngramText(col("__txt"), k).as("__gs"),
            TextOps.tokens(col("__txt")).as("__ts"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      b.count(); b
    }
    val posts = base
      .select(col("id"), posexplode(col("__gs")))
      .select(col("id"), col("pos").cast("long").as("pos"),
        DedupOps.portableHash60(col("col")).as("h"))
    t("posts explode+md5 (noop count)") { posts.count() }
    val cand = posts.groupBy("h")
      .agg(count_distinct(col("id")).as("__cd"))
      .filter(col("__cd") >= 2)
      .select("h")
    t("cand screen") { cand.count() }
    val grams = t("grams sliver persist") {
      val g = graft.Caches.track(base
        .select(col("id"), posexplode(col("__gs")))
        .select(col("id"), col("pos").cast("long").as("pos"),
          col("col").as("g"), DedupOps.portableHash60(col("col")).as("h"))
        .join(cand, Seq("h"), "left_semi")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      g.count(); g
    }
    val verified = grams.groupBy("h", "g")
      .agg(count_distinct(col("id")).as("__cd"))
      .filter(col("__cd") >= 2)
      .select("h", "g")
    val covered = grams.join(verified, Seq("h", "g"), "left_semi")
      .select(col("id"),
        explode(sequence(col("pos"), col("pos") + (k - 1))).as("p"))
      .distinct()
    t("verify + coverage") { covered.count() }
    val full = t("full d49 body end-to-end") {
      DedupOps.exactSubstrDedup(docs, "doc_id", "text", k)
        .orderBy("doc_id").count()
    }
    println(s"[probe] d49 rows: $full")
  }

  /** d50 incremental ExactSubstr, step by step (index build vs
    * incremental pass vs prior-answer swap). */
  private def substrIncr(s: SparkSession, d: String): Unit = {
    import graft.ops.DedupOps
    val docs = Tables.documents(s, d)
    val w1 = docs.filter(pmod(col("doc_id"), lit(2)) === 0)
    val w2 = docs.filter(pmod(col("doc_id"), lit(2)) === 1)
    val root = java.nio.file.Files
      .createTempDirectory("graft_probe_d50").toString
    val prior = t("exactSubstrIndex (build + writes)") {
      val p = DedupOps.exactSubstrIndex(w1, "doc_id", "text", 50,
        s"$root/idx")
      p.count(); p
    }
    val inc = t("exactSubstrIncremental") {
      val i = DedupOps.exactSubstrIncremental(w1, s"$root/idx", w2,
        "doc_id", "text", 50)
      i.count(); i
    }
    t("prior-answer swap + order") {
      prior.join(inc, Seq("doc_id"), "left_anti")
        .unionByName(inc).orderBy("doc_id").count()
    }
    val p = new org.apache.hadoop.fs.Path(root)
    p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
  }

  /** exactSubstrIncremental's body inlined with a timing per step. */
  private def substrIncrDeep(s: SparkSession, d: String): Unit = {
    import graft.ops.{DedupOps, TextOps}
    import org.apache.spark.storage.StorageLevel
    val docs = Tables.documents(s, d)
    val w1 = docs.filter(pmod(col("doc_id"), lit(2)) === 0)
    val w2 = docs.filter(pmod(col("doc_id"), lit(2)) === 1)
    val root = java.nio.file.Files
      .createTempDirectory("graft_probe_d50d").toString
    t("exactSubstrIndex (build + writes)") {
      DedupOps.exactSubstrIndex(w1, "doc_id", "text", 50,
        s"$root/idx").count()
    }
    val indexDir = s"$root/idx"
    val (idCol, textCol, k) = ("doc_id", "text", 50)
    val (indexed, arriving) = (w1, w2)
    def substrBase(df: DataFrame): DataFrame = graft.Caches.track(
      DedupOps.spread(df.select(col(idCol).as("id"),
          col(textCol).as("__txt")), "id")
        .select(col("id"),
          graft.functions.NgramText.ngramText(col("__txt"), k).as("__gs"),
          TextOps.tokens(col("__txt")).as("__ts"))
        .persist(StorageLevel.MEMORY_AND_DISK))
    def substrGrams(base: DataFrame, cand: DataFrame): DataFrame =
      graft.Caches.track(base
        .select(col("id"), posexplode(col("__gs")))
        .select(col("id"), col("pos").cast("long").as("pos"),
          col("col").as("g"), DedupOps.portableHash60(col("col")).as("h"))
        .join(cand, Seq("h"), "left_semi")
        .persist(StorageLevel.MEMORY_AND_DISK))
    val base2 = substrBase(arriving)
    val posts2 = graft.Caches.track(base2
      .select(col("id"), posexplode(col("__gs")))
      .select(col("id"), col("pos").cast("long").as("pos"),
        DedupOps.portableHash60(col("col")).as("h"))
      .persist(StorageLevel.MEMORY_AND_DISK))
    t("posts2 persist") { posts2.count() }
    val idxPosts = s.read.parquet(s"$indexDir/postings")
    val intra = posts2.groupBy("h")
      .agg(count_distinct(col("id")).as("__cd"))
      .filter(col("__cd") >= 2)
      .select("h")
    val cross = idxPosts
      .join(posts2.select("h").distinct(), Seq("h"), "left_semi")
      .select("h").distinct()
    val cand = graft.Caches.track(intra.unionByName(cross).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK))
    t("cand (intra + cross screen)") { cand.count() }
    val touchedScan = idxPosts.join(cand, Seq("h"), "left_semi")
      .select(col("id")).distinct()
    val base1 = substrBase(
      indexed.join(touchedScan.withColumnRenamed("id", idCol),
        Seq(idCol), "left_semi"))
    t("base1 (touched sliver)") { base1.count() }
    val grams = graft.Caches.track(
      substrGrams(base2, cand).unionByName(substrGrams(base1, cand))
        .persist(StorageLevel.MEMORY_AND_DISK))
    t("grams union persist") { grams.count() }
    val verified = grams.groupBy("h", "g")
      .agg(count_distinct(col("id")).as("__cd"))
      .filter(col("__cd") >= 2)
      .select("h", "g")
    val coveredNew = graft.Caches.track(
      grams.join(verified, Seq("h", "g"), "left_semi")
        .select(col("id"),
          explode(sequence(col("pos"), col("pos") + (k - 1))).as("p"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK))
    t("coveredNew persist") { coveredNew.count() }
    val shardIds = base2.select(col("id"))
    val covered2 = coveredNew.join(shardIds, Seq("id"), "left_semi")
    val touched1 = coveredNew.join(shardIds, Seq("id"), "left_anti")
      .select("id").distinct()
    val coveredOld = s.read.parquet(s"$indexDir/covered")
    val covered1 = coveredOld.join(touched1, Seq("id"), "left_semi")
      .unionByName(coveredNew.join(touched1, Seq("id"), "left_semi"))
      .distinct()
    t("  sub: covered1 count") { covered1.count() }
    t("  sub: rebuild2 count") {
      DedupOps.rebuildWithoutCovered(base2, covered2, idCol).count() }
    t("  sub: rebuild1 count") {
      DedupOps.rebuildWithoutCovered(
        base1.join(touched1, Seq("id"), "left_semi"), covered1, idCol)
        .count() }
    val out = t("out rebuild + localCheckpoint") {
      DedupOps.rebuildWithoutCovered(base2, covered2, idCol)
        .unionByName(DedupOps.rebuildWithoutCovered(
          base1.join(touched1, Seq("id"), "left_semi"), covered1, idCol))
        .localCheckpoint(true)
    }
    t("posts2 append") {
      posts2.write.mode(org.apache.spark.sql.SaveMode.Append)
        .parquet(s"$indexDir/postings")
    }
    t("coveredNew count again (cache-hot)") { coveredNew.count() }
    println(s"[probe] coveredNew rows=${coveredNew.count()} parts=${coveredNew.rdd.getNumPartitions}")
    t("coveredNew write FRESH dir") {
      coveredNew.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .parquet(s"$root/scratch_cov")
    }
    t("coveredNew localCheckpoint then append") {
      coveredNew.localCheckpoint(true)
        .write.mode(org.apache.spark.sql.SaveMode.Append)
        .parquet(s"$root/scratch_cov2")
    }
    t("coveredNew append") {
      coveredNew.write.mode(org.apache.spark.sql.SaveMode.Append)
        .parquet(s"$indexDir/covered")
    }
    t("refresh") {
      s.catalog.refreshByPath(s"$indexDir/postings")
      s.catalog.refreshByPath(s"$indexDir/covered")
    }
    println(s"[probe] out rows: ${out.count()}")
    val p = new org.apache.hadoop.fs.Path(root)
    p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
  }

  /** One Louvain round-2 plan: replicate the round body and print the
    * physical plan to check for residual Exchanges. */
  private def louvainPlan(s: SparkSession, d: String): Unit = {
    import org.apache.spark.storage.StorageLevel
    val li = Tables.lineitem(s, d).select("l_orderkey", "l_partkey")
    val edges = li.as("a").join(li.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey")
          && col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("id1"), col("b.l_partkey").as("id2"))
      .distinct()
    val sym = edges.select(col("id1").as("a"), col("id2").as("b"))
      .union(edges.select(col("id2").as("a"), col("id1").as("b")))
      .repartition(col("a"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val deg = sym.groupBy("a").agg(count(lit(1)).as("k"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val m2 = sym.count()
    val labels = deg.select(col("a").as("id"), col("a").as("lbl"))
      .localCheckpoint()
    val idside = labels.join(broadcast(deg), col("id") === col("a"))
      .select(col("id"), col("lbl").as("own"), col("k"))
    val sigma = idside.groupBy(col("own").as("c")).agg(sum(col("k")).as("sig"))
    val nbr = sym.join(
      broadcast(labels.select(col("id").as("b"), col("lbl").as("c"))), "b")
      .select(col("a"), col("c"))
    val scored = nbr.groupBy(col("a"), col("c"))
      .agg(count(lit(1)).as("kic"))
      .join(broadcast(sigma), Seq("c"))
      .join(broadcast(idside), col("a") === col("id"))
      .withColumn("score", lit(m2) * col("kic") - col("k")
        * (col("sig")
          - when(col("c") === col("own"), col("k")).otherwise(0L)))
    val best = scored.groupBy(col("a"))
      .agg(max_by(col("c"), struct(col("score"), -col("c"))).as("bc"),
        max(struct(col("score").as("s"), (-col("c")).as("n"))).as("bk"),
        first(col("own")).as("own"), first(col("k")).as("k"))
    val next = best
      .join(broadcast(sigma.select(col("c").as("own"),
        col("sig").as("sigo"))), Seq("own"))
      .select(col("a").as("id"),
        when(struct((-(col("k") * (col("sigo") - col("k")))).as("s"),
            (-col("own")).as("n")) > col("bk"),
          col("own")).otherwise(col("bc")).as("lbl"),
        col("own").as("__old"))
    println(next.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode).split("\n")
      .filter(l => l.contains("Exchange") || l.contains("Join") ||
        l.contains("HashAggregate") || l.contains("(")).take(60)
      .mkString("\n"))
  }

  /** v19 IVF-PQ append gate, step by step. */
  private def ivfpq(s: SparkSession, d: String): Unit = {
    import graft.ops.SimilarityOps
    val Grid = 0.5 / (1 << 20)
    val e = Tables.embeddings(s, d)
    val idx = java.nio.file.Files
      .createTempDirectory("graft_probe_v19").toString
    val train = e.filter(pmod(col("vec_id"), lit(10)) =!= 0)
    val batch = e.filter(pmod(col("vec_id"), lit(10)) === 0)
    t("ivfPqBuild") {
      SimilarityOps.ivfPqBuild(train, "vec_id", "embedding",
        outDir = idx, nClusters = 16, m = 8, codebook = 16,
        kmeansIters = 3, grid = Some(Grid), cacheKey = Some(s"$d:train90"))
    }
    t("ivfPqAppend") {
      SimilarityOps.ivfPqAppend(idx, batch, "vec_id", "embedding",
        grid = Some(Grid))
    }
    t("ivfPqProbe + checkpoint") {
      SimilarityOps.ivfPqProbe(idx,
          e.filter(col("vec_id") < 10), "vec_id", "embedding", k = 5,
          nProbe = 4, grid = Some(Grid))
        .orderBy("qid", "rk")
        .localCheckpoint(true)
    }
    val nf = {
      val p = new org.apache.hadoop.fs.Path(s"$idx/postings")
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      val it = fs.listFiles(p, true)
      var n = 0
      while (it.hasNext) { if (it.next().getPath.getName.startsWith("part-")) n += 1 }
      n
    }
    println(s"[probe] postings part files: $nf")
    val p = new org.apache.hadoop.fs.Path(idx)
    p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
  }

  /** d46 Louvain gate, step by step. */
  private def louvain(s: SparkSession, d: String): Unit = {
    import graft.ops.GraphOps
    val li = Tables.lineitem(s, d).select("l_orderkey", "l_partkey")
    val pairs = t("pairs build (self-join + distinct)") {
      val p = graft.Caches.track(
        li.as("a").join(li.as("b"),
            col("a.l_orderkey") === col("b.l_orderkey")
              && col("a.l_partkey") < col("b.l_partkey"))
          .select(col("a.l_partkey").as("id1"),
            col("b.l_partkey").as("id2"))
          .distinct()
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      println(s"[probe] pairs rows: ${p.count()}")
      p
    }
    val lou = t("louvainOneLevel (4 rounds)") {
      val l = GraphOps.louvainOneLevel(pairs, "id1", "id2", iters = 4)
      l.count(); l
    }
    val lpa = t("labelPropagation (4 rounds)") {
      val l = GraphOps.labelPropagation(pairs, "id1", "id2", iters = 4)
      l.count(); l
    }
    t("modularityQ (both partitions)") {
      GraphOps.modularityQ(pairs, "id1", "id2",
        Seq(("lou", lou, "id", "lbl"), ("lpa", lpa, "id", "lbl")))
    }
  }
}
