package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.SimilarityOps

/** Similarity-search queries over the `embeddings` fixture (64-dim float
  * vectors). v01/v06 are exact; v02 (LSH) and v03/v04 (IVF) are
  * approximate pipelines spelled portably — md5 hyperplanes (v02) and
  * dyadic-grid quantization (v03/v04) — so even they hash-match full
  * DuckDB replays; recall vs exact is additionally asserted in OpsSpec. */
object SimilarityQueries {

  private def emb(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)

  /** Session-lifetime labeled IVF index for the filtered-ANN gates
    * (v27/v28): built ONCE per fixture dir (the memo key carries the
    * params + meta that shape the artifacts), probed by both gates and
    * every bench repetition — build-once/probe-many measured as it
    * deploys, so the bench times the PROBE, not a rebuild per run.
    * The temp artifacts live for the session (a per-gate delete would
    * break the sharing; the dir is unique per JVM, so concurrent runs
    * never clobber) and a best-effort shutdown hook removes them.
    * Builds serialize on a dedicated lock: Caches.memo computes outside
    * its lock, so concurrent first use by v27/v28/v29 would otherwise
    * build two indexes and leak the loser's directory + shutdown hook
    * until JVM exit. The lock is per-call-site, so a multi-second build
    * here never blocks unrelated memo traffic. */
  private val ivfBuildLock = new Object
  private def labeledIvfIndex(s: SparkSession, d: String): String =
    ivfBuildLock.synchronized(graft.Caches.memo(s"ivfidx:label:$d:c16:g20") {
      val idx = java.nio.file.Files
        .createTempDirectory("graft_ivf_lbl").toString
      SimilarityOps.ivfBuild(emb(s, d), "vec_id", "embedding",
        nClusters = 16, outDir = idx, grid = Some(Grid),
        meta = Seq("label"), cacheKey = Some(s"emb:$d"))
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        try {
          val p = new org.apache.hadoop.fs.Path(idx)
          p.getFileSystem(new org.apache.hadoop.conf.Configuration())
            .delete(p, true)
        } catch { case _: Throwable => () }))
      idx
    })

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact cosine top-5 for the 10 probe vectors (vec_id < 10): broadcast
    // probes × corpus scan, WindowGroupLimit per-query heap.
    "v01_knn_bruteforce" -> ((s, d) => {
      val e = emb(s, d)
      SimilarityOps.knnBruteForce(e, e.filter(col("vec_id") < 10),
          "vec_id", "embedding", k = 5)
        .withColumn("sim", round(col("sim"), 6))
        .orderBy("qid", "rk")
    }),

    // HARD-NEGATIVE MINING — contrastive data prep: for each anchor,
    // the top-5 most-similar vectors with a DIFFERENT label (random
    // negatives are too easy; these teach the margin). v01's exact
    // broadcast scan with the label inequality IN the join condition —
    // pruned before any distance work, k always filled from true
    // negatives.
    "v36_hard_negatives" -> ((s, d) => {
      val e = emb(s, d)
      SimilarityOps.hardNegatives(e, "vec_id", "embedding", "label",
          e.filter(col("vec_id") < 10), k = 5)
        .withColumn("sim", round(col("sim"), 6))
        .orderBy("qid", "rk")
    }),

    // int8 symmetric scalar quantization + quantized kNN: one corpus-max
    // scale probe, -127..127 floor-grid codes, EXACT integer dot
    // products (no float drift at all — the one similarity gate that
    // needs no rounding grid). Brute-force probe side like v01; the
    // scale path composes the codes with IVF candidate bounding.
    "v09_sq_knn" -> ((s, d) => {
      val e = emb(s, d)
      val sc = SimilarityOps.sqScale(e, "embedding")
      val q = SimilarityOps.sqQuantize(e, "vec_id", "embedding",
        sc, "id", "qv")
      SimilarityOps.sqKnn(q, q.filter(col("id") < 10), k = 5)
        .orderBy("qid", "rk")
    }),

    // Threshold RANGE search (FAISS range_search): all neighbors with
    // cosine ≥ 0.3 — variable-cardinality results, a filter close
    // instead of a top-k heap.
    "v26_range_search" -> ((s, d) => {
      val e = emb(s, d)
      SimilarityOps.rangeSearch(e, e.filter(col("vec_id") < 10),
          "vec_id", "embedding", minSim = 0.3, grid = Some(Grid))
        .withColumn("sim", graft.ops.TextOps.round6(col("sim")))
        .orderBy("qid", "nid")
    }),

    // FILTERED ANN — "top-5 WHERE label = 2", predicate + vector search
    // combined (the query every production vector store serves): the
    // index postings carry the label (meta = Seq("label") at build),
    // the predicate applies ON the cluster-partitioned postings scan
    // (PushedFilters, before any distance work), and top-k ranks the
    // survivors — filter-then-rank, so no rank-then-filter holes.
    // Fully oracled: the k-means replay posts labels and filters the
    // identical candidate set.
    "v27_filtered_ann" -> ((s, d) => {
      val e = emb(s, d)
      val idx = labeledIvfIndex(s, d) // session-shared, v28 reuses it
      SimilarityOps.ivfProbeFiltered(idx,
          e.filter(col("vec_id") < 10), "vec_id", "embedding",
          k = 5, nProbe = 4, pred = col("label") === 2, grid = Some(Grid))
        .withColumn("sim", graft.ops.TextOps.round6(col("sim")))
        .orderBy("qid", "rk")
    }),

    // Filtered-ANN ACCEPTANCE (the v16 discipline for v27): recall@5 of
    // the filtered IVF probe against the filtered BRUTE-FORCE answer —
    // the number a deployment watches when predicates get selective
    // (fewer candidates per probed cluster → raise nProbe).
    "v28_filtered_recall" -> ((s, d) => {
      val e = emb(s, d)
      val q = e.filter(col("vec_id") < 10)
      val idx = labeledIvfIndex(s, d) // session-shared with v27
      val approx = SimilarityOps.ivfProbeFiltered(idx, q, "vec_id",
          "embedding", k = 5, nProbe = 4, pred = col("label") === 2,
          grid = Some(Grid))
        .select("qid", "nid")
      val exact = SimilarityOps.knnBruteForce(
          e.filter(col("label") === 2), q, "vec_id", "embedding", 5)
        .select("qid", "nid")
      graft.ops.EvalOps.recallAtK(approx, exact).orderBy("qid")
    }),

    // MRR (mean reciprocal rank) retrieval eval: at which rank does the
    // IVF ranking first surface a TRUE top-5 neighbor — the
    // order-sensitive sibling of v16's recall and v17's NDCG (recall
    // can't see rank-1-vs-rank-5; NDCG needs the whole list). rr in
    // exact 1e-6 units (floor(1e6/rank + 0.5)), 0 = no true neighbor
    // surfaced at all.
    "v30_mrr" -> ((s, d) => {
      val e = emb(s, d)
      val q = e.filter(col("vec_id") < 10)
      val approx = SimilarityOps.ivfSearch(e, q, "vec_id", "embedding",
          k = 5, nClusters = 16, nProbe = 4, grid = Some(Grid),
          cacheKey = Some(s"emb:$d"))
        .select("qid", "rk", "nid")
      val exact = SimilarityOps.knnBruteForce(e, q, "vec_id",
          "embedding", 5)
        .select("qid", "nid")
      val firstHit = approx.join(exact, Seq("qid", "nid"))
        .groupBy("qid").agg(min(col("rk")).as("first_rank"))
      q.select(col("vec_id").as("qid"))
        .join(firstHit, Seq("qid"), "left")
        .withColumn("rr_u", when(col("first_rank").isNotNull,
          floor(lit(1e6) / col("first_rank") + 0.5).cast("long"))
          .otherwise(lit(0L)))
        .select("qid", "first_rank", "rr_u")
        .orderBy("qid")
    }),

    // STREAMING index maintenance: v08's append path driven by a real
    // micro-batch stream — the 10% batch arrives over TWO foreachBatch
    // epochs, each appending against the FROZEN centroids (no rebuild,
    // only touched cluster partitions gain files), then one probe of
    // the maintained index. Answers the identical batch question, so it
    // re-registers v08's oracle VERBATIM (the e57 = e27 doctrine).
    "v31_stream_ivf_append" -> ((s, d) => {
      implicit val sqlCtx = s.sqlContext
      import s.implicits._
      val e = emb(s, d)
      val idx = java.nio.file.Files
        .createTempDirectory("graft_v31_ivf").toString
      val train = e.filter(pmod(col("vec_id"), lit(10)) =!= 0)
      SimilarityOps.ivfBuild(train, "vec_id", "embedding",
        nClusters = 16, outDir = idx, grid = Some(Grid),
        cacheKey = Some(s"embtrain90:$d"))
      // replay feed memoized (immutable Vectors; key encodes the pmod-10
      // append slice) — the bench measures the streaming append + probe,
      // not a repeated fixture collect
      val rows = graft.Caches.memo(s"replay:emb10:$d") {
        e.filter(pmod(col("vec_id"), lit(10)) === 0)
          .select(col("vec_id"), col("embedding")).collect()
          .map(r => (r.getLong(0), r.getSeq[Float](1).toVector)).toVector
      }
      val input = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Seq[Float])]
      val q = input.toDF().toDF("vec_id", "embedding")
        .writeStream
        .foreachBatch {
          (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
           _: Long) =>
            SimilarityOps.ivfAppend(idx, batch.toDF(), "vec_id",
              "embedding", grid = Some(Grid))
        }
        .start()
      try {
        val (a, b) = rows.splitAt(rows.length / 2)
        input.addData(a: _*); q.processAllAvailable()
        input.addData(b: _*); q.processAllAvailable()
      } finally q.stop()
      val res = SimilarityOps.ivfProbe(idx, e.filter(col("vec_id") < 10),
          "vec_id", "embedding", k = 5, nProbe = 4, grid = Some(Grid))
        .withColumn("sim", graft.ops.TextOps.round6(col("sim")))
        .orderBy("qid", "rk")
        .localCheckpoint(true) // materialize off the temp index files
      val p = new org.apache.hadoop.fs.Path(idx)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      res
    }),

    // Per-cluster SILHOUETTE quality of the IVF clustering (simplified
    // silhouette: a = cosine distance to the OWN centroid, b = min
    // distance to any OTHER centroid, s = (b−a)/max(a,b)) — the "is
    // this index worth probing" audit a k-means build ships with.
    // Per-vector s quantized to 1e-6-unit LONGS (per-row exact on
    // grid-snapped dots), so the per-cluster mean is one exact integer
    // sum + one division — no float-association drift. Reuses the
    // v27/v28 session index; the oracle replays the k-means and scores
    // the identical assignment.
    "v29_silhouette" -> ((s, d) => {
      val idx = labeledIvfIndex(s, d)
      val cents = s.read.parquet(s"$idx/centroids").orderBy("cluster")
        .collect().map(_.getSeq[Double](1).toArray) // k x dim driver state
      val dcols = cents.map(c =>
        lit(1.0) - graft.functions.DotProduct.dotNative(col("ce"),
          array(c.map(lit).toIndexedSeq: _*)))
      val staged = s.read.parquet(s"$idx/postings")
        .select(col("nid"), col("cluster"),
          array(dcols.toIndexedSeq: _*).as("__dist"))
      val a = element_at(col("__dist"), col("cluster") + 1)
      val b = array_min(filter(col("__dist"),
        (_, i) => i =!= col("cluster")))
      staged
        .select(col("cluster"),
          floor((when(greatest(a, b) === 0.0, lit(0.0))
            .otherwise((b - a) / greatest(a, b))) * 1e6 + 0.5)
            .cast("long").as("__su"))
        .groupBy("cluster")
        .agg(count(lit(1)).as("n"), sum(col("__su")).as("__s"))
        .select(col("cluster"), col("n"),
          graft.ops.TextOps.round6(col("__s").cast("double") / lit(1e6)
            / col("n").cast("double")).as("mean_sil6"))
        .orderBy("cluster")
    }),

    // IVF nprobe tuning curve: micro-recall@5 (total hits / total
    // relevant — exact integers) for nprobe ∈ {1,2,4,8} against ONE
    // persisted index — the recall-vs-probe-cost datasheet an IVF
    // deployment is tuned from. Build once, probe four times; exact
    // side computed once and persisted.
    "v25_nprobe_curve" -> ((s, d) => {
      val e = emb(s, d)
      val q = e.filter(col("vec_id") < 10)
      val idx = java.nio.file.Files
        .createTempDirectory("graft_v25_ivf").toString
      SimilarityOps.ivfBuild(e, "vec_id", "embedding", nClusters = 16,
        outDir = idx, grid = Some(Grid), cacheKey = Some(s"emb:$d"))
      val exact = graft.Caches.track(
        SimilarityOps.knnBruteForce(e, q, "vec_id", "embedding", 5)
          .select("qid", "nid")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      val nRel = exact.count() // bounded: |queries|·k rows
      val rows = Seq(1, 2, 4, 8).map { np =>
        val hits = SimilarityOps.ivfProbe(idx, q, "vec_id", "embedding",
            k = 5, nProbe = np, grid = Some(Grid))
          .select("qid", "nid")
          .join(exact, Seq("qid", "nid")).count()
        // same floor arithmetic as the oracle, on identical doubles
        (np, hits, nRel,
          math.floor(hits.toDouble / nRel.toDouble * 1e6 + 0.5) / 1e6)
      }
      val p = new org.apache.hadoop.fs.Path(idx)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      import s.implicits._
      rows.toDF("nprobe", "n_hits", "n_rel", "recall6").orderBy("nprobe")
    }),

    // Binary (1-bit) quantization + Hamming kNN: 32× compression where
    // a comparison is two xor+popcounts — exact integer end to end, so
    // the full index hash-matches with no grid.
    "v23_binary_hamming" -> ((s, d) => {
      val codes = SimilarityOps.binaryCodes(emb(s, d), "vec_id",
        "embedding", "id")
      SimilarityOps.hammingKnn(codes, codes.filter(col("id") < 10), k = 5)
        .orderBy("qid", "rk")
    }),

    // Binary acceptance: recall@5 of the Hamming ranking vs exact
    // cosine — what 32× compression costs in neighbors.
    "v24_binary_recall" -> ((s, d) => {
      val e = emb(s, d)
      val codes = SimilarityOps.binaryCodes(e, "vec_id", "embedding", "id")
      val approx = SimilarityOps
        .hammingKnn(codes, codes.filter(col("id") < 10), k = 5)
        .select("qid", "nid")
      val exact = SimilarityOps.knnBruteForce(e,
          e.filter(col("vec_id") < 10), "vec_id", "embedding", 5)
        .select("qid", "nid")
      graft.ops.EvalOps.recallAtK(approx, exact).orderBy("qid")
    }),

    // PQ distortion audit: per-subspace reconstruction MSE of the v12
    // codes — 1e-9-unit exact integer distance sums, so even the mean
    // hash-matches; shares v12's memoized codebooks (auditing a trained
    // index costs one corpus pass).
    "v22_pq_distortion" -> ((s, d) =>
      SimilarityOps.pqDistortion(emb(s, d), "vec_id", "embedding",
        m = 8, codebook = 16, kmeansIters = 3, grid = Some(Grid),
        cacheKey = Some(d))),

    // SQ8 acceptance: recall@5 of the quantized integer-dot ranking
    // against exact cosine — the "does 4× memory compression cost any
    // neighbors" datasheet (v16's recall machinery over v09's index).
    "v21_sq_recall" -> ((s, d) => {
      val e = emb(s, d)
      val sc = SimilarityOps.sqScale(e, "embedding")
      val qz = SimilarityOps.sqQuantize(e, "vec_id", "embedding",
        sc, "id", "qv")
      val approx = SimilarityOps.sqKnn(qz, qz.filter(col("id") < 10), k = 5)
        .select("qid", "nid")
      val exact = SimilarityOps.knnBruteForce(e,
          e.filter(col("vec_id") < 10), "vec_id", "embedding", 5)
        .select("qid", "nid")
      graft.ops.EvalOps.recallAtK(approx, exact).orderBy("qid")
    }),

    // IVF-SQ8: cluster-bounded candidates (v03's equi-join) re-ranked by
    // the EXACT integer dot of symmetric int8 codes (v09's grid) — the
    // composed memory×compute ANN plan, and still fully oracleable
    // because nothing after the grid-portable k-means is float-drift-
    // sensitive.
    "v10_ivf_sq" -> ((s, d) => {
      val e = emb(s, d)
      SimilarityOps.ivfSqSearch(e, e.filter(col("vec_id") < 10),
          "vec_id", "embedding", k = 5, nClusters = 16, nProbe = 4,
          grid = Some(Grid), cacheKey = Some(s"emb:$d"))
        .orderBy("qid", "rk")
    }),

    // The same kNN through the pure SQL surface: graft_dot (the codegen'd
    // expression GraftExtensions registers) composed in spark.sql — the
    // "switch to this library without leaving SQL" story; same plan shape
    // (broadcast probes, per-qid top-k window) and the v01 oracle.
    "v06_knn_sql" -> ((s, d) => {
      graft.Tables.registerAll(s, d)
      s.sql("""
        WITH n AS (
          SELECT vec_id, e, sqrt(graft_dot(e, e)) AS nrm
          FROM (SELECT vec_id, CAST(embedding AS array<double>) AS e
                FROM embeddings)),
        q AS (SELECT * FROM n WHERE vec_id < 10),
        scored AS (
          SELECT /*+ BROADCAST(q) */ q.vec_id AS qid, c.vec_id AS nid,
            graft_dot(c.e, q.e) / (c.nrm * q.nrm) AS sim
          FROM n c JOIN q ON c.vec_id <> q.vec_id),
        ranked AS (
          SELECT qid, CAST(row_number() OVER (PARTITION BY qid
              ORDER BY sim DESC, nid ASC) AS INT) AS rk,
            nid, round(sim, 6) AS sim
          FROM scored)
        SELECT qid, rk, nid, sim FROM ranked WHERE rk <= 5
        ORDER BY qid, rk""")
    }),

    // Multi-table hyperplane-LSH ANN (24 tables × 4 bits): bucket equi-join
    // replaces the full probe×corpus product. 24 tables holds recall ≥ 0.8
    // even on the uniform-random fixtures (sims ~0.3 → per-table collision
    // ~0.13, miss (0.87)^24 ≈ 0.03) — asserted each round in OpsSpec.
    // The gate seeds the planes with the ENGINE-PORTABLE md5 generator
    // (the d05 trick), so the full approximate pipeline — planes → sign
    // buckets → collision candidates → exact re-rank — hash-matches a
    // DuckDB oracle that recomputes the identical planes from md5.
    // (Library default stays the PRNG planes; portability only matters
    // when an external engine must replay the run.)
    "v02_ann_lsh" -> ((s, d) => {
      val e = emb(s, d)
      SimilarityOps.annLsh(e, e.filter(col("vec_id") < 10),
          "vec_id", "embedding", k = 5, tables = 24, bits = 4,
          planesFlat = Some(SimilarityOps.hyperplanesPortable(96, 64)))
        .withColumn("sim", round(col("sim"), 6))
        .orderBy("qid", "rk")
    }),

    // GRAPH-BASED ANN, construction half: the deterministic k-NN graph
    // (the HNSW/NSW index family) — every vector's top-4 cosine
    // neighbors among its LSH candidates (8 md5-portable tables × 4
    // bits; the banded self-join, never all-pairs). The whole build —
    // planes → sign buckets → candidate pairs → exact re-rank →
    // per-node top-m heap — replays in DuckDB (the v02 discipline
    // extended from probe to index construction).
    "v37_knn_graph" -> ((s, d) =>
      SimilarityOps.knnGraphBuild(emb(s, d), "vec_id", "embedding",
          m = 4, tables = 8, bits = 4,
          planesFlat = Some(SimilarityOps.hyperplanesPortable(32, 64)))
        .withColumn("sim", round(col("sim"), 6))
        .orderBy("src", "rk")),

    // GRAPH-BASED ANN, probe half: batched NSW beam search over v37's
    // graph — LSH-seeded entries (the query's top-4 bucket collisions
    // under the build's own planes, + the 4 smallest ids as backstop),
    // 3 hops of UNDIRECTED expand-score-prune at beam 8 (out-edges ∪
    // reversed in-edges, the NSW convention), closed to top-5. Scored
    // vectors per query ≈ 2·entryK + hops·beam·2m —
    // corpus-size-independent (the point of a graph index); the walk
    // replays in DuckDB hop-for-hop (deterministic ties throughout).
    // Recall vs v01 exact and vs IVF at matched probe cost is asserted
    // in OpsSpec each round.
    "v38_knn_graph_search" -> ((s, d) => {
      val e = emb(s, d)
      val g = SimilarityOps.knnGraphBuild(e, "vec_id", "embedding",
        m = 4, tables = 8, bits = 4,
        planesFlat = Some(SimilarityOps.hyperplanesPortable(32, 64)))
      SimilarityOps.knnGraphSearch(g, e, e.filter(col("vec_id") < 10),
          "vec_id", "embedding", k = 5, entryK = 4, beam = 8, hops = 3,
          tables = 8, bits = 4,
          planesFlat = Some(SimilarityOps.hyperplanesPortable(32, 64)))
        .withColumn("sim", round(col("sim"), 6))
        .orderBy("qid", "rk")
    }),

    // GRAPH-BASED ANN with the BUCKET-CAP straggler guard — the sf1
    // rehearsal's scale remedy as its own oracled gate: the candidate
    // self-join's dst side keeps only the 64 smallest ids per (table,
    // bucket) (pairs occ²→occ·cap; every node still sources edges), and
    // the capped build + the same seeded undirected beam walk replay in
    // DuckDB end-to-end — proving the remedy is deterministic, not a
    // sampling heuristic.
    "v39_knn_graph_capped" -> ((s, d) => {
      val e = emb(s, d)
      val g = SimilarityOps.knnGraphBuild(e, "vec_id", "embedding",
        m = 4, tables = 8, bits = 4,
        planesFlat = Some(SimilarityOps.hyperplanesPortable(32, 64)),
        bucketCap = Some(64))
      SimilarityOps.knnGraphSearch(g, e, e.filter(col("vec_id") < 10),
          "vec_id", "embedding", k = 5, entryK = 4, beam = 8, hops = 3,
          tables = 8, bits = 4,
          planesFlat = Some(SimilarityOps.hyperplanesPortable(32, 64)))
        .withColumn("sim", round(col("sim"), 6))
        .orderBy("qid", "rk")
    }),

    // GRAPH-BASED ANN, incremental maintenance: ivfAppend's contract
    // for the graph index — build on the 95% old corpus, APPEND the
    // arriving 5% wave (candidates = only collisions involving a new
    // vector; one per-src top-m merge of kept old edges with the newly
    // scored pairs — the old↔old work is never re-paid), then the
    // seeded beam walk over the updated graph. The whole
    // build→append→walk chain replays in DuckDB.
    "v40_knn_graph_append" -> ((s, d) => {
      val e = emb(s, d)
      val pls = Some(SimilarityOps.hyperplanesPortable(32, 64))
      val old = e.filter(col("vec_id") >= 100)
      val batch = e.filter(col("vec_id") < 100)
      val g0 = SimilarityOps.knnGraphBuild(old, "vec_id", "embedding",
        m = 4, tables = 8, bits = 4, planesFlat = pls)
      val g1 = SimilarityOps.knnGraphAppend(g0, old, batch, "vec_id",
        "embedding", m = 4, tables = 8, bits = 4, planesFlat = pls)
      SimilarityOps.knnGraphSearch(g1, e, e.filter(col("vec_id") < 10),
          "vec_id", "embedding", k = 5, entryK = 4, beam = 8, hops = 3,
          tables = 8, bits = 4, planesFlat = pls)
        .withColumn("sim", round(col("sim"), 6))
        .orderBy("qid", "rk")
    }),

    // IVF ANN: deterministic k-means buckets, nprobe-closest probed per
    // query. The gate runs the ENGINE-PORTABLE grid variant (components
    // snapped to the 2^-20 dyadic grid after normalization): on grid
    // values every centroid average and dot product is EXACT in doubles —
    // order-independent — so the whole fixed-iteration k-means + probe +
    // re-rank recurrence hash-matches a DuckDB oracle that unrolls the
    // same three iterations in SQL (the d05/v02 md5 trick, extended from
    // portable INPUTS to portable AGGREGATES). Library default stays
    // un-quantized.
    // CLUSTER-CURATION DATASHEET — the cluster-based curation read
    // (DataComp-style: cluster by embedding, decide per cluster): v03's
    // memo-shared dyadic k-means + nearest-centroid assignment, then per
    // cluster its size and top-3 characteristic terms by cluster-TF ×
    // inverse cluster frequency (score = tf/df, one correctly-rounded
    // division; (score DESC, term ASC) is a total order so ranks replay
    // engine-identically). Ids are shared between the embeddings and
    // documents fixtures by construction.
    "v35_cluster_terms" -> ((s, d) =>
      SimilarityOps.clusterTerms(emb(s, d), "vec_id", "embedding",
          Tables.documents(s, d), "doc_id", "text",
          nClusters = 16, topTerms = 3, grid = Some(Grid),
          cacheKey = Some(s"emb:$d"))
        .orderBy("cluster", "rank")),

    "v03_ann_ivf" -> ((s, d) => {
      val e = emb(s, d)
      SimilarityOps.ivfSearch(e, e.filter(col("vec_id") < 10),
          "vec_id", "embedding", k = 5, nClusters = 16, nProbe = 4,
          grid = Some(Grid), cacheKey = Some(s"emb:$d"))
        .withColumn("sim", graft.ops.TextOps.round6(col("sim")))
        .orderBy("qid", "rk")
    }),

    // IVF build-once/probe-many: the index (centroids + cluster-partitioned
    // postings) round-trips through parquet artifacts, then a probe query
    // runs against the RELOADED index — the actual 100 TB deployment shape
    // (f20's build→write→read→probe pattern for ANN). Same parameters as
    // v03 (grid-portable; doubles survive the parquet round-trip exactly),
    // so it shares v03's DuckDB oracle; OpsSpec additionally asserts the
    // probe matches the in-process v03 results exactly and holds recall
    // ≥ 0.8 vs exact.
    "v04_ivf_persist" -> ((s, d) => {
      val e = emb(s, d)
      // unique per-invocation dir (a fixed path would let two concurrent
      // runs overwrite each other's index mid-probe)
      val idx = java.nio.file.Files
        .createTempDirectory("graft_v04_ivf").toString
      SimilarityOps.ivfBuild(e, "vec_id", "embedding", nClusters = 16,
        outDir = idx, grid = Some(Grid), cacheKey = Some(s"emb:$d"))
      val res = SimilarityOps.ivfProbe(idx, e.filter(col("vec_id") < 10),
          "vec_id", "embedding", k = 5, nProbe = 4, grid = Some(Grid))
        .withColumn("sim", graft.ops.TextOps.round6(col("sim")))
        .orderBy("qid", "rk")
        .localCheckpoint(true) // materialize off the temp index files
      val p = new org.apache.hadoop.fs.Path(idx)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      res
    }),

    // IVF index MAINTENANCE: build on 90% of the corpus, append the
    // other 10% against the FROZEN centroids (no rebuild, no corpus
    // rewrite), probe the maintained index. Fully oracled: the DuckDB
    // replay trains k-means on the same 90% and posts ALL vectors.
    "v08_ivf_append" -> ((s, d) => {
      val e = emb(s, d)
      val idx = java.nio.file.Files
        .createTempDirectory("graft_v08_ivf").toString
      val train = e.filter(pmod(col("vec_id"), lit(10)) =!= 0)
      val batch = e.filter(pmod(col("vec_id"), lit(10)) === 0)
      SimilarityOps.ivfBuild(train, "vec_id", "embedding",
        nClusters = 16, outDir = idx, grid = Some(Grid),
        cacheKey = Some(s"embtrain90:$d"))
      SimilarityOps.ivfAppend(idx, batch, "vec_id", "embedding",
        grid = Some(Grid))
      val res = SimilarityOps.ivfProbe(idx, e.filter(col("vec_id") < 10),
          "vec_id", "embedding", k = 5, nProbe = 4, grid = Some(Grid))
        .withColumn("sim", graft.ops.TextOps.round6(col("sim")))
        .orderBy("qid", "rk")
        .localCheckpoint(true) // materialize off the temp index files
      val p = new org.apache.hadoop.fs.Path(idx)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      res
    }),

    // Drift-triggered IVF REPAIR — the lifecycle decision operator on
    // top of v08's maintenance contract (build → probe → append →
    // monitor → REPAIR): build on the 90% slice, append the 10% batch
    // against frozen centroids, measure per-cluster assignment drift
    // (1 − ⟨centroid, one-Lloyd-re-center⟩ in the portable dyadic
    // arithmetic), repair ONLY the clusters past τ=0.012 (local
    // re-center + reassignment within the drifted region;
    // delete-then-append rewrites just those partitions), and carry
    // recall@5 before/after vs the exact brute force as in-plan 1-row
    // broadcast columns (Σhits/Σk micro-recall — exact integers, ONE
    // division). Queries = 50 APPENDED vectors (the drifted region —
    // where repair pays: 0.552 → 0.560 at sf0.01, 0.524 → 0.528 at
    // sf0.1). Fully oracled via the dyadic k-means replay.
    "v32_ivf_repair" -> ((s, d) => {
      val e = emb(s, d)
      val idx = java.nio.file.Files
        .createTempDirectory("graft_v32_ivf").toString
      val train = e.filter(pmod(col("vec_id"), lit(10)) =!= 0)
      val batch = e.filter(pmod(col("vec_id"), lit(10)) === 0)
      SimilarityOps.ivfBuild(train, "vec_id", "embedding",
        nClusters = 16, outDir = idx, grid = Some(Grid),
        cacheKey = Some(s"embtrain90:$d"))
      SimilarityOps.ivfAppend(idx, batch, "vec_id", "embedding",
        grid = Some(Grid))
      val q = e.filter(pmod(col("vec_id"), lit(10)) === 0
        && col("vec_id") < 500)
      val exact = graft.Caches.track(
        SimilarityOps.knnBruteForce(e, q, "vec_id", "embedding", 5)
          .select("qid", "nid")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      // eager (localCheckpoint): the index mutates between the probes
      def microRecall(name: String) =
        graft.ops.EvalOps.recallAtK(
            SimilarityOps.ivfProbe(idx, q, "vec_id", "embedding",
              k = 5, nProbe = 4, grid = Some(Grid)).select("qid", "nid"),
            exact)
          .agg(sum(col("hits")).as("h"), sum(col("k")).as("t"))
          .select(graft.ops.TextOps.round6(col("h").cast("double")
            / col("t").cast("double")).as(name))
          .withColumn("__k", lit(1))
          .localCheckpoint(true)
      val before = microRecall("recall_before6")
      val report = SimilarityOps.ivfRepair(s, idx, threshold = 0.012,
        grid = Some(Grid))
      val after = microRecall("recall_after6")
      val res = report.withColumn("__k", lit(1))
        .join(broadcast(before), Seq("__k"))
        .join(broadcast(after), Seq("__k"))
        .select("cluster", "drift6", "repaired",
          "recall_before6", "recall_after6")
        .orderBy("cluster")
        .localCheckpoint(true)
      val p = new org.apache.hadoop.fs.Path(idx)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      res
    }),

    // Per-label centroid + cosine-to-own-centroid coherence score (the
    // embedding outlier detector): centroids are ONE bounded partial+final
    // avg over exploded components, broadcast back; exact and
    // DuckDB-oracled (deterministic per-vector sequential sums).
    "v05_group_centroid" -> ((s, d) =>
      SimilarityOps.groupCentroidSim(emb(s, d), "vec_id", "embedding",
          "label")
        .select(col("vec_id"), col("label"),
          graft.ops.TextOps.round6(col("sim")).as("sim"))
        .orderBy("vec_id")),

    // Pairwise label-centroid cosine matrix (upper triangle incl. self):
    // which groups sit close in embedding space. Corpus vectors feed ONE
    // bounded centroid aggregation; pairing runs on labels × dim only.
    "v07_centroid_matrix" -> ((s, d) =>
      SimilarityOps.centroidMatrix(emb(s, d), "embedding", "label")
        .select(col("l1"), col("l2"),
          graft.ops.TextOps.round6(col("cos")).as("cos"))
        .orderBy("l1", "l2")),

    // Product quantization with ADC scoring (the FAISS PQ index — the
    // trio's third leg after IVF and SQ8): 8 subspaces × 16 Euclidean
    // codebooks, codes join a broadcast per-query LUT on (subspace,
    // code) — never probe×corpus on raw vectors. Grid-portable
    // training makes the whole approximate pipeline hash-match the
    // unrolled DuckDB replay; ADC sums are exact on the grid (no
    // rounding anywhere).
    "v12_pq" -> ((s, d) => {
      val e = emb(s, d)
      SimilarityOps.pqSearch(e, e.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 5, m = 8, codebook = 16,
        kmeansIters = 3, grid = Some(Grid), cacheKey = Some(d))
        .orderBy("qid", "rk")
    }),

    // IVF-PQ — the composed FAISS workhorse: v03's coarse cluster
    // bounding (queries meet only nProbe probed clusters) + v12's
    // 4-byte codes scored through the broadcast per-query LUT. One
    // corpus pass emits both coarse assignment and codes; the ADC
    // explode fans out candidates, not the corpus. Fully oracled.
    "v13_ivf_pq" -> ((s, d) => {
      val e = emb(s, d)
      SimilarityOps.ivfPqSearch(e, e.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 5, nClusters = 16, nProbe = 4,
        m = 8, codebook = 16, kmeansIters = 3, grid = Some(Grid),
        cacheKey = Some(d))
        .orderBy("qid", "rk")
    }),

    // PQ build-once/probe-many: codebooks + packed codes round-trip
    // through parquet artifacts, then the probe runs against the
    // RELOADED index — no retraining, no corpus re-read (the v04
    // deployment shape for the compressed-payload index). Same
    // parameters as v12, so it shares v12's oracle; OpsSpec asserts the
    // probe matches in-process pqSearch exactly.
    "v14_pq_persist" -> ((s, d) => {
      val e = emb(s, d)
      val idx = java.nio.file.Files
        .createTempDirectory("graft_v14_pq").toString
      SimilarityOps.pqBuild(e, "vec_id", "embedding", outDir = idx,
        m = 8, codebook = 16, kmeansIters = 3, grid = Some(Grid),
        cacheKey = Some(d))
      val res = SimilarityOps.pqProbe(idx, e.filter(col("vec_id") < 10),
          "vec_id", "embedding", k = 5, grid = Some(Grid))
        .orderBy("qid", "rk")
        .localCheckpoint(true) // materialize off the temp index files
      val p = new org.apache.hadoop.fs.Path(idx)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      res
    }),

    // INDEX DELETION — the right-to-be-forgotten path completing the
    // lifecycle (build → probe → append → monitor → repair → DELETE):
    // 5% of the corpus (vec_id % 20 == 3) is erased from the persisted
    // index; only the touched cluster partitions rewrite (the v32
    // delete-then-append discipline), centroids stay frozen, and the
    // probe must answer from the SURVIVING postings only — the oracle
    // replays the build with the deleted ids excluded from scoring.
    "v34_ivf_delete" -> ((s, d) => {
      val e = emb(s, d)
      val idx = java.nio.file.Files
        .createTempDirectory("graft_v34_ivf").toString
      SimilarityOps.ivfBuild(e, "vec_id", "embedding", nClusters = 16,
        outDir = idx, grid = Some(Grid), cacheKey = Some(s"emb:$d"))
      SimilarityOps.ivfDelete(s, idx,
        e.filter(pmod(col("vec_id"), lit(20)) === 3).select("vec_id"),
        "vec_id")
      val res = SimilarityOps.ivfProbe(idx, e.filter(col("vec_id") < 10),
          "vec_id", "embedding", k = 5, nProbe = 4, grid = Some(Grid))
        .withColumn("sim", graft.ops.TextOps.round6(col("sim")))
        .orderBy("qid", "rk")
        .localCheckpoint(true) // materialize off the temp index files
      val p = new org.apache.hadoop.fs.Path(idx)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      res
    }),

    // Two-stage PQ serving (FAISS IndexRefineFlat): the compressed
    // index shortlists 25 ADC candidates per query, the RAW vectors
    // re-rank just those 25 exactly and keep top-5 — recall becomes
    // "is the true neighbor anywhere in the shortlist", at 25 exact
    // dots per query instead of a corpus scan. Fully oracled: the PQ
    // replay at topK=25 nests as the candidate set, the refine is
    // grid-exact dots.
    "v33_pq_refine" -> ((s, d) => {
      val e = emb(s, d)
      val idx = java.nio.file.Files
        .createTempDirectory("graft_v33_pq").toString
      SimilarityOps.pqBuild(e, "vec_id", "embedding", outDir = idx,
        m = 8, codebook = 16, kmeansIters = 3, grid = Some(Grid),
        cacheKey = Some(d))
      val q = e.filter(col("vec_id") < 10)
      val shortlist = SimilarityOps.pqProbe(idx, q,
          "vec_id", "embedding", k = 25, grid = Some(Grid))
        .select("qid", "nid")
      val res = SimilarityOps.refineExact(e, q, shortlist,
          "vec_id", "embedding", k = 5, grid = Some(Grid))
        .withColumn("sim", graft.ops.TextOps.round6(col("sim")))
        .orderBy("qid", "rk")
        .localCheckpoint(true) // materialize off the temp index files
      val p = new org.apache.hadoop.fs.Path(idx)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      res
    }),

    // IVF-PQ build-once/probe-many: coarse centroids + codebooks +
    // cluster-PARTITIONED code postings as artifacts; the probe reads
    // only the probed clusters' partitions and only 4-byte codes — the
    // double reduction deployed. Shares v13's oracle.
    "v15_ivfpq_persist" -> ((s, d) => {
      val e = emb(s, d)
      val idx = java.nio.file.Files
        .createTempDirectory("graft_v15_ivfpq").toString
      SimilarityOps.ivfPqBuild(e, "vec_id", "embedding", outDir = idx,
        nClusters = 16, m = 8, codebook = 16,
        kmeansIters = 3, grid = Some(Grid), cacheKey = Some(d))
      val res = SimilarityOps.ivfPqProbe(idx,
          e.filter(col("vec_id") < 10), "vec_id", "embedding", k = 5,
          nProbe = 4, grid = Some(Grid))
        .orderBy("qid", "rk")
        .localCheckpoint(true) // materialize off the temp index files
      val p = new org.apache.hadoop.fs.Path(idx)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      res
    }),

    // IVF-PQ index MAINTENANCE: build on 90% of the corpus, append the
    // other 10% against the FROZEN coarse centroids AND codebooks (no
    // retraining, no rewrite — each append lands one parquet file per
    // touched cluster partition), probe the maintained index. The
    // oracle trains on the same 90% and codes ALL vectors.
    "v19_ivfpq_append" -> ((s, d) => {
      val e = emb(s, d)
      val idx = java.nio.file.Files
        .createTempDirectory("graft_v19_ivfpq").toString
      val train = e.filter(pmod(col("vec_id"), lit(10)) =!= 0)
      val batch = e.filter(pmod(col("vec_id"), lit(10)) === 0)
      // cache key marks the 90% training slice — MUST stay distinct
      // from v15's full-corpus key or the memo would serve the wrong
      // codebooks
      SimilarityOps.ivfPqBuild(train, "vec_id", "embedding",
        outDir = idx, nClusters = 16, m = 8, codebook = 16,
        kmeansIters = 3, grid = Some(Grid), cacheKey = Some(s"$d:train90"))
      SimilarityOps.ivfPqAppend(idx, batch, "vec_id", "embedding",
        grid = Some(Grid))
      val res = SimilarityOps.ivfPqProbe(idx,
          e.filter(col("vec_id") < 10), "vec_id", "embedding", k = 5,
          nProbe = 4, grid = Some(Grid))
        .orderBy("qid", "rk")
        .localCheckpoint(true) // materialize off the temp index files
      val p = new org.apache.hadoop.fs.Path(idx)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      res
    }),

    // Embedding centroid drift per label between the even/odd corpus
    // halves — the embedder-upgrade / corpus-mix drift monitor; one
    // bounded component aggregation, cosine on the |labels|×dim frame.
    "v20_centroid_drift" -> ((s, d) =>
      SimilarityOps.centroidDrift(emb(s, d), "vec_id", "embedding",
          "label")
        .orderBy("label")),

    // ANN acceptance metric: recall@5 of the grid-IVF index against the
    // exact brute-force answer, per query — the number every index
    // deploy is judged by, fully oracled by composing the two replays.
    "v16_recall_eval" -> ((s, d) => {
      val e = emb(s, d)
      val q = e.filter(col("vec_id") < 10)
      val approx = SimilarityOps.ivfSearch(e, q, "vec_id", "embedding",
        k = 5, nClusters = 16, nProbe = 4, grid = Some(Grid))
        .select("qid", "nid")
      val exact = SimilarityOps.knnBruteForce(e, q, "vec_id", "embedding", 5)
        .select("qid", "nid")
      graft.ops.EvalOps.recallAtK(approx, exact).orderBy("qid")
    }),

    // MMR diversified re-ranking: top-20 brute-force candidates per
    // query, greedy λ=0.5 relevance-vs-redundancy selection of 5 —
    // relational rounds (anti-join + keyed max-sim + rank-1 window),
    // oracle unrolls the identical rounds. Grid-snapped dots throughout.
    "v18_mmr_rerank" -> ((s, d) => {
      val e = emb(s, d)
      val q = e.filter(col("vec_id") < 10)
      SimilarityOps.mmrRerank(e, q, "vec_id", "embedding",
          nCand = 20, k = 5, lambda = 0.5, grid = Some(Grid))
        .orderBy("qid", "pos")
    }),

    // Order-sensitive ANN acceptance: NDCG@5 of the grid-IVF ranking
    // against the exact one (recall@k can't see right-neighbors-wrong-
    // order). Relevance graded by exact rank; position discounts are
    // PINNED micro-unit integers, so DCG is an exact BIGINT dot product.
    "v17_ndcg_eval" -> ((s, d) => {
      val e = emb(s, d)
      val q = e.filter(col("vec_id") < 10)
      val approx = SimilarityOps.ivfSearch(e, q, "vec_id", "embedding",
        k = 5, nClusters = 16, nProbe = 4, grid = Some(Grid))
        .select("qid", "rk", "nid")
      val exact = SimilarityOps.knnBruteForce(e, q, "vec_id", "embedding", 5)
        .select("qid", "rk", "nid")
      graft.ops.EvalOps.ndcgAtK(approx, exact).orderBy("qid")
    }),

    // Uncentered top principal component by power iteration: ONE
    // dim²-bounded Gram aggregation + driver-side power steps, then a
    // codegen'd projection dot per vector. Grid-snapped inputs +
    // 1e-9-snapped iterates make the WHOLE recurrence engine-portable
    // (the d20/v03 discipline composed) — even the eigenvalue
    // hash-matches the unrolled DuckDB replay.
    "v11_pca" -> ((s, d) => {
      val e = emb(s, d)
      val (w, lam) = SimilarityOps.pcaPower(e, "vec_id", "embedding",
        dim = 64, iters = 8, grid = Some(Grid))
      val lam6 = math.floor(lam * 1e6 + 0.5) / 1e6
      val wLit = array(w.map(lit).toIndexedSeq: _*)
      SimilarityOps.normalizedQ(e, "vec_id", "embedding", "vec_id", "e",
          Some(Grid))
        .select(col("vec_id"),
          graft.ops.TextOps.round6(
            graft.functions.DotProduct.dotNative(col("e"), wLit))
            .as("score6"),
          lit(lam6).as("lam6"))
        .orderBy("vec_id")
    })
  )

  /** 2^20 — the dyadic quantization grid for the portable IVF gates. */
  private val Grid = 1048576.0
  private val GridS = f"$Grid%.1f"

  /** v18 oracle: the MMR greedy unrolled — candidates + pair sims as
    * MATERIALIZED CTEs, then k selection rounds, each an anti-screen
    * (NOT EXISTS over the union of prior picks) + max-sim join + rank-1
    * pick with the identical 0.5·rel − 0.5·mx spelling. */
  private def mmrOracle(nCand: Int, k: Int, g: Double): String = {
    val gs = f"$g%.1f"
    val sus = (2 to k).map { i =>
      val su = s"(${(1 until i).map(j => s"SELECT qid, nid FROM sel$j")
        .mkString(" UNION ALL ")})"
      s"""sel$i AS MATERIALIZED (
           SELECT qid, nid, $i AS pos, sc AS score FROM (
             SELECT c.qid, c.nid, 0.5 * c.rel - 0.5 * m.mx AS sc,
               row_number() OVER (PARTITION BY c.qid
                 ORDER BY 0.5 * c.rel - 0.5 * m.mx DESC, c.nid ASC) AS rk
             FROM cand c
             JOIN (SELECT ps.qid, ps.cn AS nid, max(ps.psim) AS mx
                   FROM ps JOIN $su su
                     ON su.qid = ps.qid AND su.nid = ps.sn
                   GROUP BY 1, 2) m
               ON m.qid = c.qid AND m.nid = c.nid
             WHERE NOT EXISTS (SELECT 1 FROM $su sx
               WHERE sx.qid = c.qid AND sx.nid = c.nid)
           ) WHERE rk = 1)"""
    }.mkString(",\n         ")
    s"""WITH v0 AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS e0
           FROM embeddings),
         nrm AS MATERIALIZED (SELECT id,
             list_transform(e0, x -> floor(x / nn * $gs + 0.5) / $gs) AS e
           FROM (SELECT id, e0, sqrt(list_dot_product(e0, e0)) AS nn
                 FROM v0)),
         qq AS (SELECT * FROM nrm WHERE id < 10),
         scq AS (SELECT q.id AS qid, c.id AS nid,
             list_dot_product(c.e, q.e) AS rel
           FROM nrm c JOIN qq q ON c.id <> q.id),
         cand AS MATERIALIZED (SELECT qid, nid, rel FROM (
             SELECT *, row_number() OVER (PARTITION BY qid
               ORDER BY rel DESC, nid ASC) AS rk
             FROM scq) WHERE rk <= $nCand),
         ps AS MATERIALIZED (SELECT a.qid, a.nid AS cn, b.nid AS sn,
             list_dot_product(na.e, nb.e) AS psim
           FROM cand a JOIN cand b
             ON a.qid = b.qid AND a.nid <> b.nid
           JOIN nrm na ON na.id = a.nid
           JOIN nrm nb ON nb.id = b.nid),
         sel1 AS (SELECT qid, nid, 1 AS pos, rel AS score FROM (
             SELECT *, row_number() OVER (PARTITION BY qid
               ORDER BY rel DESC, nid ASC) AS rk
             FROM cand) WHERE rk = 1),
         $sus
         SELECT qid, pos, nid, floor(score * 1e6 + 0.5) / 1e6 AS score6
         FROM (${(1 to k).map(i => s"SELECT * FROM sel$i")
      .mkString(" UNION ALL ")})
         ORDER BY qid, pos"""
  }

  /** DuckDB replay of the grid-portable IVF pipeline: the fixed-iteration
    * k-means is UNROLLED (cent0 → cent1 → … → cent`iters`), each round =
    * argmax-dot assignment (ties → larger cluster, mirroring Spark's
    * `greatest` struct compare) + per-component quantized mean + quantized
    * re-normalization; then final assignment → postings, per-query top-
    * `nProbe` probe (ties → smaller cluster, mirroring probeClusters), and
    * exact-dot re-rank. Every sum the SQL engine may reorder runs over
    * grid values, so it is exact and order-independent — bit-identical to
    * Spark's sequential graft_dot and avg. */
  private def ivfOracle(k: Int, iters: Int, nProbe: Int, topK: Int,
                        dim: Int, g: Double,
                        trainFilter: String = "TRUE",
                        sq: Boolean = false,
                        labelFilter: Option[String] = None,
                        postingFilter: Option[String] = None): String = {
    val gs = f"$g%.1f"
    // metadata plumbing for the FILTERED probe (v27): carry `label`
    // through v0/nrm/posting so `scored` can apply the predicate —
    // absent a filter the generated SQL is byte-identical to before.
    // postingFilter (v34 deletes) needs no plumbing: it predicates on
    // o.nid directly.
    val lbl = if (labelFilter.isDefined) ", label" else ""
    val lblN = if (labelFilter.isDefined) ", n.label" else ""
    val postPred = labelFilter.fold("")(f => s" AND $f") +
      postingFilter.fold("")(f => s" AND $f")
    def iterSql(i: Int) = s"""
      asg$i AS (
        SELECT id, e, cluster FROM (
          SELECT n.id, n.e, c.cluster,
            row_number() OVER (PARTITION BY n.id
              ORDER BY list_dot_product(n.e, c.c) DESC, c.cluster DESC) AS rn
          FROM trn n, cent$i c) WHERE rn = 1),
      avg$i AS (
        SELECT a.cluster, g.i - 1 AS pos,
          floor(avg(a.e[g.i]) * $gs + 0.5) / $gs AS m
        FROM asg$i a, generate_series(1, $dim) g(i) GROUP BY 1, 2),
      raw$i AS (
        SELECT p.cluster, coalesce(u.c, p.c) AS c
        FROM cent$i p LEFT JOIN (
          SELECT cluster, list(m ORDER BY pos) AS c FROM avg$i GROUP BY 1
        ) u USING (cluster)),
      cent${i + 1} AS (
        SELECT r.cluster,
          CASE WHEN n.nn = 0 THEN r.c
            ELSE list_transform(r.c,
              x -> floor(x / n.nn * $gs + 0.5) / $gs) END AS c
        FROM raw$i r JOIN (
          SELECT cluster, sqrt(sum(x * x)) AS nn
          FROM (SELECT cluster, unnest(c) AS x FROM raw$i) GROUP BY 1
        ) n USING (cluster))"""
    s"""WITH
      v0 AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS e0$lbl
             FROM embeddings),
      nrm AS (
        SELECT id, list_transform(e0,
          x -> floor(x / nn * $gs + 0.5) / $gs) AS e$lbl
        FROM (SELECT id, e0$lbl,
          sqrt(list_dot_product(e0, e0)) AS nn FROM v0)),
      trn AS (SELECT * FROM nrm WHERE $trainFilter),
      cent0 AS (
        SELECT CAST(row_number() OVER (ORDER BY id) AS INTEGER) - 1
            AS cluster, e AS c
        FROM (SELECT id, e FROM trn ORDER BY id LIMIT $k)),
      ${(0 until iters).map(iterSql).mkString(",")},
      posting AS (
        SELECT id AS nid, e AS ce, cluster$lbl FROM (
          SELECT n.id, n.e$lblN, c.cluster,
            row_number() OVER (PARTITION BY n.id
              ORDER BY list_dot_product(n.e, c.c) DESC, c.cluster DESC) AS rn
          FROM nrm n, cent$iters c) WHERE rn = 1),
      probe AS (
        SELECT qid, qe, cluster FROM (
          SELECT n.id AS qid, n.e AS qe, c.cluster,
            row_number() OVER (PARTITION BY n.id
              ORDER BY list_dot_product(n.e, c.c) DESC, c.cluster ASC) AS crk
          FROM nrm n, cent$iters c WHERE n.id < 10) WHERE crk <= $nProbe),
      ${if (!sq)
        s"""scored AS (
        SELECT p.qid, o.nid, list_dot_product(o.ce, p.qe) AS sim
        FROM posting o JOIN probe p USING (cluster)
        WHERE o.nid <> p.qid$postPred)
      SELECT qid, CAST(row_number() OVER (PARTITION BY qid
          ORDER BY sim DESC, nid ASC) AS INTEGER) AS rk,
        nid, floor(sim * 1e6 + 0.5) / 1e6 AS sim
      FROM scored QUALIFY rk <= $topK ORDER BY qid, rk"""
      else
        s"""sc AS (SELECT max(list_max(list_transform(e, x -> abs(x))))
            AS s FROM nrm),
      qz AS (SELECT nid, cluster, list_transform(ce, x ->
            least(127.0, greatest(-127.0, floor(x / s * 127.0 + 0.5))))
            AS cq
        FROM posting, sc),
      pq AS (SELECT qid, cluster, list_transform(qe, x ->
            least(127.0, greatest(-127.0, floor(x / s * 127.0 + 0.5))))
            AS qq
        FROM probe, sc),
      scored AS (
        SELECT p.qid, o.nid,
          CAST(list_dot_product(o.cq, p.qq) AS BIGINT) AS qdot
        FROM qz o JOIN pq p USING (cluster) WHERE o.nid <> p.qid)
      SELECT qid, CAST(row_number() OVER (PARTITION BY qid
          ORDER BY qdot DESC, nid ASC) AS INTEGER) AS rk, nid, qdot
      FROM scored QUALIFY rk <= $topK ORDER BY qid, rk"""}"""
  }

  private val IvfSql =
    ivfOracle(k = 16, iters = 3, nProbe = 4, topK = 5, dim = 64, g = Grid)

  private val KnnSql =
    """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
                  FROM embeddings),
       q AS (SELECT * FROM v WHERE vec_id < 10),
       scored AS (
         SELECT q.vec_id AS qid, c.vec_id AS nid,
           list_cosine_similarity(c.e, q.e) AS sim
         FROM v c JOIN q ON c.vec_id <> q.vec_id)
       SELECT qid,
         CAST(row_number() OVER (PARTITION BY qid
           ORDER BY sim DESC, nid ASC) AS INTEGER) AS rk,
         nid, round(sim, 6) AS sim
       FROM scored QUALIFY rk <= 5 ORDER BY qid, rk"""

  /** v32 oracle: the v08 append replay (train on the 90% slice, posting
    * = full corpus assigned to the frozen centroids), the per-cluster
    * drift measurement (one Lloyd re-center in the identical dyadic
    * arithmetic), the local repair of clusters past `tau` (re-center +
    * reassignment WITHIN the drifted region, smaller-region postings
    * untouched), and both probes closed to the Σhits/Σk micro-recall
    * against the raw brute-force exact side. Repair-path CTEs are
    * MATERIALIZED (scalar/IN subqueries read them repeatedly — the
    * d31/d45 lesson). */
  private def ivfRepairOracle(k: Int, iters: Int, nProbe: Int, topK: Int,
                              dim: Int, g: Double, tau: String): String = {
    val gs = f"$g%.1f"
    def iterSql(i: Int) = s"""
      asg$i AS (
        SELECT id, e, cluster FROM (
          SELECT n.id, n.e, c.cluster,
            row_number() OVER (PARTITION BY n.id
              ORDER BY list_dot_product(n.e, c.c) DESC, c.cluster DESC) AS rn
          FROM trn n, cent$i c) WHERE rn = 1),
      avg$i AS (
        SELECT a.cluster, g.i - 1 AS pos,
          floor(avg(a.e[g.i]) * $gs + 0.5) / $gs AS m
        FROM asg$i a, generate_series(1, $dim) g(i) GROUP BY 1, 2),
      raw$i AS (
        SELECT p.cluster, coalesce(u.c, p.c) AS c
        FROM cent$i p LEFT JOIN (
          SELECT cluster, list(m ORDER BY pos) AS c FROM avg$i GROUP BY 1
        ) u USING (cluster)),
      cent${i + 1} AS (
        SELECT r.cluster,
          CASE WHEN n.nn = 0 THEN r.c
            ELSE list_transform(r.c,
              x -> floor(x / n.nn * $gs + 0.5) / $gs) END AS c
        FROM raw$i r JOIN (
          SELECT cluster, sqrt(sum(x * x)) AS nn
          FROM (SELECT cluster, unnest(c) AS x FROM raw$i) GROUP BY 1
        ) n USING (cluster))"""
    def probeAp(cent: String, posting: String, pfx: String) = s"""
      probe$pfx AS MATERIALIZED (SELECT qid, qe, cluster FROM (
          SELECT n.id AS qid, n.e AS qe, c.cluster,
            row_number() OVER (PARTITION BY n.id
              ORDER BY list_dot_product(n.e, c.c) DESC, c.cluster ASC)
              AS crk
          FROM nrm n, $cent c
          WHERE n.id % 10 = 0 AND n.id < 500) WHERE crk <= $nProbe),
      ap$pfx AS MATERIALIZED (SELECT qid, nid FROM (
          SELECT p.qid, o.nid,
            row_number() OVER (PARTITION BY p.qid
              ORDER BY list_dot_product(o.ce, p.qe) DESC, o.nid ASC) AS rk
          FROM $posting o JOIN probe$pfx p USING (cluster)
          WHERE o.nid <> p.qid)
        WHERE rk <= $topK)"""
    s"""WITH
      v0 AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS e0
             FROM embeddings),
      nrm AS (
        SELECT id, list_transform(e0,
          x -> floor(x / nn * $gs + 0.5) / $gs) AS e
        FROM (SELECT id, e0,
          sqrt(list_dot_product(e0, e0)) AS nn FROM v0)),
      trn AS (SELECT * FROM nrm WHERE id % 10 <> 0),
      cent0 AS (
        SELECT CAST(row_number() OVER (ORDER BY id) AS INTEGER) - 1
            AS cluster, e AS c
        FROM (SELECT id, e FROM trn ORDER BY id LIMIT $k)),
      ${(0 until iters).map(iterSql).mkString(",")},
      posting AS MATERIALIZED (
        SELECT id AS nid, e AS ce, cluster FROM (
          SELECT n.id, n.e, c.cluster,
            row_number() OVER (PARTITION BY n.id
              ORDER BY list_dot_product(n.e, c.c) DESC, c.cluster DESC) AS rn
          FROM nrm n, cent$iters c) WHERE rn = 1),
      ravg AS (
        SELECT p.cluster, g.i - 1 AS pos,
          floor(avg(p.ce[g.i]) * $gs + 0.5) / $gs AS m
        FROM posting p, generate_series(1, $dim) g(i) GROUP BY 1, 2),
      rraw AS (
        SELECT c.cluster, coalesce(u.c, c.c) AS c
        FROM cent$iters c LEFT JOIN (
          SELECT cluster, list(m ORDER BY pos) AS c FROM ravg GROUP BY 1
        ) u USING (cluster)),
      rcent AS MATERIALIZED (
        SELECT r.cluster,
          CASE WHEN n.nn = 0 THEN r.c
            ELSE list_transform(r.c,
              x -> floor(x / n.nn * $gs + 0.5) / $gs) END AS c
        FROM rraw r JOIN (
          SELECT cluster, sqrt(sum(x * x)) AS nn
          FROM (SELECT cluster, unnest(c) AS x FROM rraw) GROUP BY 1
        ) n USING (cluster)),
      drift AS MATERIALIZED (
        SELECT c3.cluster,
          floor((1 - list_dot_product(c3.c, rc.c)) * 1e6 + 0.5) / 1e6
            AS drift6
        FROM cent$iters c3 JOIN rcent rc USING (cluster)),
      rep AS MATERIALIZED (SELECT cluster FROM drift WHERE drift6 > $tau),
      newcent AS MATERIALIZED (
        SELECT c3.cluster,
          CASE WHEN c3.cluster IN (SELECT cluster FROM rep)
            THEN rc.c ELSE c3.c END AS c
        FROM cent$iters c3 JOIN rcent rc USING (cluster)),
      region AS (SELECT nid, ce FROM posting
        WHERE cluster IN (SELECT cluster FROM rep)),
      repc AS (SELECT cluster, c FROM newcent
        WHERE cluster IN (SELECT cluster FROM rep)),
      moved AS MATERIALIZED (SELECT nid, ce, cluster FROM (
          SELECT p.nid, p.ce, c.cluster,
            row_number() OVER (PARTITION BY p.nid
              ORDER BY list_dot_product(p.ce, c.c) DESC, c.cluster DESC)
              AS rn
          FROM region p, repc c) WHERE rn = 1),
      posting2 AS MATERIALIZED (
        SELECT nid, ce, cluster FROM posting
          WHERE cluster NOT IN (SELECT cluster FROM rep)
        UNION ALL SELECT nid, ce, cluster FROM moved),
      ${probeAp(s"cent$iters", "posting", "B")},
      ${probeAp("newcent", "posting2", "A")},
      ex AS MATERIALIZED (SELECT qid, nid FROM (
          SELECT q.id AS qid, c.id AS nid,
            row_number() OVER (PARTITION BY q.id
              ORDER BY list_cosine_similarity(c.e0, q.e0) DESC, c.id ASC)
              AS rk
          FROM v0 c
          JOIN (SELECT * FROM v0 WHERE id % 10 = 0 AND id < 500) q
            ON c.id <> q.id)
        WHERE rk <= $topK),
      rb AS MATERIALIZED (SELECT
          floor(CAST((SELECT count(*) FROM ex JOIN apB USING (qid, nid))
              AS DOUBLE)
            / CAST((SELECT count(*) FROM ex) AS DOUBLE) * 1e6 + 0.5)
            / 1e6 AS recall_before6),
      ra AS MATERIALIZED (SELECT
          floor(CAST((SELECT count(*) FROM ex JOIN apA USING (qid, nid))
              AS DOUBLE)
            / CAST((SELECT count(*) FROM ex) AS DOUBLE) * 1e6 + 0.5)
            / 1e6 AS recall_after6)
      SELECT d.cluster, d.drift6,
        d.cluster IN (SELECT cluster FROM rep) AS repaired,
        rb.recall_before6, ra.recall_after6
      FROM drift d, rb, ra ORDER BY d.cluster"""
  }

  // v27: the IVF replay with labels posted and the candidate set
  // filtered identically (pre-filter: predicate before rank).
  private val FilteredIvfSql =
    ivfOracle(k = 16, iters = 3, nProbe = 4, topK = 5, dim = 64, g = Grid,
      labelFilter = Some("o.label = 2"))

  // v28's exact side: brute-force cosine top-5 over the FILTERED corpus.
  private val FilteredKnnSql =
    """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e, label
                  FROM embeddings),
       q AS (SELECT * FROM v WHERE vec_id < 10),
       scored AS (
         SELECT q.vec_id AS qid, c.vec_id AS nid,
           list_cosine_similarity(c.e, q.e) AS sim
         FROM v c JOIN q ON c.vec_id <> q.vec_id WHERE c.label = 2)
       SELECT qid,
         CAST(row_number() OVER (PARTITION BY qid
           ORDER BY sim DESC, nid ASC) AS INTEGER) AS rk,
         nid, round(sim, 6) AS sim
       FROM scored QUALIFY rk <= 5 ORDER BY qid, rk"""

  // v09 (and v21's approximate side): the whole scalar-quantization
  // pipeline replayed — corpus-max scale, symmetric floor-grid codes,
  // integer dot. Every step is exact arithmetic on identical doubles,
  // so no rounding grid anywhere.
  private val SqKnnSql =
    """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
                    FROM embeddings),
         sc AS (SELECT max(list_max(list_transform(e, x -> abs(x))))
             AS s FROM v),
         q AS (SELECT vec_id, list_transform(e, x ->
             least(127.0, greatest(-127.0,
               floor(x / s * 127.0 + 0.5)))) AS qv
           FROM v, sc),
         scored AS (SELECT p.vec_id AS qid, c.vec_id AS nid,
             CAST(list_dot_product(c.qv, p.qv) AS BIGINT) AS qdot
           FROM q c JOIN (SELECT * FROM q WHERE vec_id < 10) p
             ON c.vec_id <> p.vec_id)
         SELECT qid, CAST(row_number() OVER (PARTITION BY qid
             ORDER BY qdot DESC, nid ASC) AS INTEGER) AS rk,
           nid, qdot
         FROM scored QUALIFY rk <= 5 ORDER BY qid, rk"""

  // v23 (and v24's approximate side): identical sign-mask packing
  // (exact integer sums of 2^i) and xor+popcount ranking — no grid.
  private val BinaryHammingSql =
    """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
             FROM embeddings),
         c AS (SELECT vec_id,
             CAST(list_sum(list_transform(range(0, 32),
               i -> CASE WHEN e[CAST(i AS INTEGER) + 1] > 0
                 THEN CAST(1 AS BIGINT) << i
                 ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS b0,
             CAST(list_sum(list_transform(range(0, 32),
               i -> CASE WHEN e[CAST(i AS INTEGER) + 33] > 0
                 THEN CAST(1 AS BIGINT) << i
                 ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS b1
           FROM v),
         q AS (SELECT * FROM c WHERE vec_id < 10),
         sc AS (SELECT q.vec_id AS qid, c.vec_id AS nid,
             CAST(bit_count(xor(c.b0, q.b0))
               + bit_count(xor(c.b1, q.b1)) AS INTEGER) AS ham
           FROM c JOIN q ON c.vec_id <> q.vec_id)
         SELECT qid, CAST(row_number() OVER (PARTITION BY qid
             ORDER BY ham ASC, nid ASC) AS INTEGER) AS rk, nid, ham
         FROM sc QUALIFY rk <= 5 ORDER BY qid, rk"""

  /** Shared v37/v38/v39 graph CTEs: md5 hyperplanes (`planes`
    * 4-bit-packed planes, the v02 spelling), sign buckets, banded
    * candidate pairs (dst side optionally capped to the `cap` smallest
    * ids per bucket — the bucketCap replay), exact cosine re-rank,
    * per-node top-`m` edges. */
  private def knnGraphCtes(planes: Int, m: Int,
                           cap: Option[Int] = None): String =
    s"""v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
             FROM embeddings),
       pw AS (
         SELECT p.p, j.j,
           CAST(concat('0x',
               substr(md5('hp:' || p.p || ':' || j.j), 1, 15)) AS BIGINT)
             / 576460752303423488.0 - 1.0 AS w
         FROM generate_series(0, ${planes - 1}) p(p),
           generate_series(0, 63) j(j)),
       pl AS (SELECT p, list(w ORDER BY j) AS wl FROM pw GROUP BY p),
       sig AS MATERIALIZED (
         SELECT v.vec_id, CAST(pl.p // 4 AS INTEGER) AS tbl,
           sum(CASE WHEN list_dot_product(v.e, pl.wl) >= 0
               THEN (1::BIGINT << (pl.p % 4)) ELSE 0 END) AS bucket
         FROM v, pl GROUP BY 1, 2),
       dsig AS (${cap.fold("SELECT vec_id, tbl, bucket FROM sig")(c =>
        s"""SELECT vec_id, tbl, bucket FROM (
             SELECT sig.*, row_number() OVER (PARTITION BY tbl, bucket
               ORDER BY vec_id) AS br FROM sig) t
           WHERE br <= $c""")}),
       gcand AS (
         SELECT DISTINCT a.vec_id AS src, b.vec_id AS dst
         FROM sig a JOIN dsig b
           ON a.tbl = b.tbl AND a.bucket = b.bucket
             AND a.vec_id <> b.vec_id),
       gsc AS (
         SELECT gcand.src, gcand.dst,
           list_cosine_similarity(dv.e, sv.e) AS sim
         FROM gcand
           JOIN v sv ON sv.vec_id = gcand.src
           JOIN v dv ON dv.vec_id = gcand.dst),
       edges AS MATERIALIZED (
         SELECT src, CAST(row_number() OVER (PARTITION BY src
             ORDER BY sim DESC, dst ASC) AS INTEGER) AS rk, dst, sim
         FROM gsc QUALIFY rk <= $m)"""

  /** v38: the beam walk unrolled — LSH-seeded entry scoring (the
    * query's top-`entryK` bucket collisions by (count DESC, nid ASC)
    * under the build's `sig`, + the `entryK` smallest ids as
    * backstop), then per hop "previous beam ∪ its UNDIRECTED
    * neighbors scored, top-`beam` per query" (`ue` = out ∪ reversed
    * in; UNION dedups re-reached nodes: a
    * node's sim is the identical double whenever computed), closed by
    * the top-`k` rank. */
  private def knnGraphSearchSql(planes: Int, m: Int, entryK: Int,
                                beam: Int, hops: Int, k: Int,
                                cap: Option[Int] = None): String =
    s"""WITH ${knnGraphCtes(planes, m, cap)},
       ${knnGraphWalkSql(entryK, beam, hops, k)}"""

  /** v40: the APPEND replay — edges0 from old↔old candidates only
    * (vec_id ≥ `splitId`), the appended wave's candidates = collisions
    * involving a new vector (old→new ∪ new→new via "b new", plus
    * new→old), merged by ONE per-src top-`m` over (kept old edges ∪
    * newly scored pairs), then the shared seeded walk over the updated
    * graph. */
  private def knnGraphAppendSql(planes: Int, m: Int, entryK: Int,
                                beam: Int, hops: Int, k: Int,
                                splitId: Long): String = {
    val base = knnGraphCtes(planes, m) // v/pw/pl/sig + full-corpus edges (unused)
    // cut the full-corpus gcand/gsc/edges tail: keep through `sig ... ),`
    val keep = base.substring(0, base.indexOf("dsig AS"))
    s"""WITH $keep
       gc0 AS (
         SELECT DISTINCT a.vec_id AS src, b.vec_id AS dst
         FROM sig a JOIN sig b
           ON a.tbl = b.tbl AND a.bucket = b.bucket
             AND a.vec_id <> b.vec_id
         WHERE a.vec_id >= $splitId AND b.vec_id >= $splitId),
       gsc0 AS (
         SELECT gc0.src, gc0.dst,
           list_cosine_similarity(dv.e, sv.e) AS sim
         FROM gc0
           JOIN v sv ON sv.vec_id = gc0.src
           JOIN v dv ON dv.vec_id = gc0.dst),
       ed0 AS MATERIALIZED (
         SELECT src, dst, sim FROM (
           SELECT src, dst, sim, row_number() OVER (PARTITION BY src
             ORDER BY sim DESC, dst ASC) AS rk0 FROM gsc0) t
         WHERE rk0 <= $m),
       gcn AS (
         SELECT DISTINCT a.vec_id AS src, b.vec_id AS dst
         FROM sig a JOIN sig b
           ON a.tbl = b.tbl AND a.bucket = b.bucket
             AND a.vec_id <> b.vec_id
         WHERE b.vec_id < $splitId
            OR (a.vec_id < $splitId AND b.vec_id >= $splitId)),
       gscn AS (
         SELECT gcn.src, gcn.dst,
           list_cosine_similarity(dv.e, sv.e) AS sim
         FROM gcn
           JOIN v sv ON sv.vec_id = gcn.src
           JOIN v dv ON dv.vec_id = gcn.dst),
       edges AS MATERIALIZED (
         SELECT src, CAST(row_number() OVER (PARTITION BY src
             ORDER BY sim DESC, dst ASC) AS INTEGER) AS rk, dst, sim
         FROM (SELECT src, dst, sim FROM ed0
               UNION ALL SELECT src, dst, sim FROM gscn) u
         QUALIFY rk <= $m),
       ${knnGraphWalkSql(entryK, beam, hops, k)}"""
  }

  /** The walk suffix shared by v38/v39/v40: expects CTEs `v` (vectors),
    * `sig` (signatures) and `edges` (the graph) to be in scope. */
  private def knnGraphWalkSql(entryK: Int, beam: Int, hops: Int,
                              k: Int): String = {
    val hopCtes = (1 to hops).map { i =>
      s"""s$i AS (
           SELECT qid, nid, sim FROM c${i - 1}
           UNION
           SELECT DISTINCT c.qid, ed.dst AS nid,
             list_cosine_similarity(cv.e, qv.qe) AS sim
           FROM c${i - 1} c
             JOIN ue ed ON ed.src = c.nid
             JOIN v cv ON cv.vec_id = ed.dst
             JOIN q qv ON qv.qid = c.qid
           WHERE ed.dst <> c.qid),
         c$i AS MATERIALIZED (
           SELECT qid, nid, sim FROM (
             SELECT qid, nid, sim, row_number() OVER (PARTITION BY qid
               ORDER BY sim DESC, nid ASC) AS bk FROM s$i) t
           WHERE bk <= $beam)"""
    }.mkString(",\n")
    s"""ue AS (
         SELECT DISTINCT src, dst FROM (
           SELECT src, dst FROM edges
           UNION ALL SELECT dst AS src, src AS dst FROM edges) t),
       q AS (SELECT vec_id AS qid, e AS qe FROM v WHERE vec_id < 10),
       en AS (SELECT vec_id AS nid FROM v ORDER BY vec_id LIMIT $entryK),
       seed AS (
         SELECT qid, nid FROM (
           SELECT a.vec_id AS qid, b.vec_id AS nid,
             row_number() OVER (PARTITION BY a.vec_id
               ORDER BY count(*) DESC, b.vec_id ASC) AS erk
           FROM sig a JOIN sig b
             ON a.tbl = b.tbl AND a.bucket = b.bucket
               AND a.vec_id <> b.vec_id
           WHERE a.vec_id < 10
           GROUP BY a.vec_id, b.vec_id) t
         WHERE erk <= $entryK),
       e0 AS (
         SELECT DISTINCT qid, nid FROM (
           SELECT qid, nid FROM seed
           UNION ALL SELECT q.qid, en.nid FROM q, en) u),
       s0 AS (
         SELECT e0.qid, e0.nid,
           list_cosine_similarity(cv.e, qv.qe) AS sim
         FROM e0 JOIN v cv ON cv.vec_id = e0.nid
           JOIN q qv ON qv.qid = e0.qid
         WHERE e0.nid <> e0.qid),
       c0 AS MATERIALIZED (
         SELECT qid, nid, sim FROM (
           SELECT qid, nid, sim, row_number() OVER (PARTITION BY qid
             ORDER BY sim DESC, nid ASC) AS bk FROM s0) t
         WHERE bk <= $beam),
       $hopCtes
       SELECT qid, CAST(row_number() OVER (PARTITION BY qid
           ORDER BY sim DESC, nid ASC) AS INTEGER) AS rk,
         nid, round(sim, 6) AS sim
       FROM c$hops QUALIFY rk <= $k ORDER BY qid, rk"""
  }

  val oracles: Map[String, String] = Map(
    "v06_knn_sql" -> KnnSql,
    // v37: the graph build replayed end-to-end (the v02 LSH replay
    // extended from probe to index construction).
    "v37_knn_graph" ->
      s"""WITH ${knnGraphCtes(planes = 32, m = 4)}
         SELECT src, rk, dst, round(sim, 6) AS sim FROM edges
         ORDER BY src, rk""",
    // v38: build replay + the unrolled 3-hop beam walk.
    "v38_knn_graph_search" -> knnGraphSearchSql(planes = 32, m = 4,
      entryK = 4, beam = 8, hops = 3, k = 5),
    // v39: the identical walk over the bucket-capped build (dst side
    // of each bucket cut to the 64 smallest ids before pairing).
    "v39_knn_graph_capped" -> knnGraphSearchSql(planes = 32, m = 4,
      entryK = 4, beam = 8, hops = 3, k = 5, cap = Some(64)),
    // v40: the append replay — old-only build, wave candidates, one
    // top-m merge, the shared walk over the updated graph.
    "v40_knn_graph_append" -> knnGraphAppendSql(planes = 32, m = 4,
      entryK = 4, beam = 8, hops = 3, k = 5, splitId = 100L),
    "v01_knn_bruteforce" -> KnnSql,
    // v36: v01's scored CTE with the label-inequality predicate in the
    // join — negatives ranked per anchor, labels surfaced.
    "v36_hard_negatives" ->
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
                    label FROM embeddings),
         q AS (SELECT * FROM v WHERE vec_id < 10),
         scored AS (
           SELECT q.vec_id AS qid, c.vec_id AS nid,
             q.label AS q_label, c.label AS n_label,
             list_cosine_similarity(c.e, q.e) AS sim
           FROM v c JOIN q
             ON c.vec_id <> q.vec_id AND c.label <> q.label)
         SELECT qid,
           CAST(row_number() OVER (PARTITION BY qid
             ORDER BY sim DESC, nid ASC) AS INTEGER) AS rk,
           nid, q_label, n_label, round(sim, 6) AS sim
         FROM scored QUALIFY rk <= 5 ORDER BY qid, rk""",
    "v09_sq_knn" -> SqKnnSql,
    // v21: the v16 recall closing over the SQ8 ranking instead of the
    // IVF one — does 4×-compressed memory cost any neighbors?
    "v21_sq_recall" ->
      s"""WITH ap AS (SELECT qid, nid FROM ($SqKnnSql) t),
         ex AS (SELECT qid, nid FROM ($KnnSql) t2),
         h AS (SELECT ex.qid, CAST(count(*) AS BIGINT) AS hits
           FROM ex JOIN ap ON ex.qid = ap.qid AND ex.nid = ap.nid
           GROUP BY 1),
         kk AS (SELECT qid, CAST(count(*) AS BIGINT) AS k
           FROM ex GROUP BY 1)
         SELECT kk.qid, CAST(COALESCE(hits, 0) AS BIGINT) AS hits, k,
           floor(CAST(COALESCE(hits, 0) AS DOUBLE) / k * 1e6 + 0.5)
             / 1e6 AS recall6
         FROM kk LEFT JOIN h ON kk.qid = h.qid ORDER BY kk.qid""",
    // v03/v04: the grid-portable IVF pipeline replayed end-to-end in SQL
    // (unrolled k-means — see ivfOracle). v04 shares v03's oracle: the
    // parquet round-trip preserves doubles exactly.
    "v03_ann_ivf" -> IvfSql,
    // v35: the same unrolled dyadic k-means replay, closed by sizes +
    // (cluster, term) tf + the tf/df characteristic-term rank.
    "v35_cluster_terms" ->
      clusterTermsOracle(k = 16, iters = 3, dim = 64, g = Grid,
        topTerms = 3),
    "v04_ivf_persist" -> IvfSql,
    // v10: v03's unrolled pipeline with the SQ tail — quantized codes
    // over the corpus-max scale, integer-dot re-rank.
    "v10_ivf_sq" -> ivfOracle(k = 16, iters = 3, nProbe = 4, topK = 5,
      dim = 64, g = Grid, sq = true),
    // v08: same replay, k-means trained on the 90% split only (the
    // append gate's frozen-centroid contract); postings cover everything.
    "v08_ivf_append" -> ivfOracle(k = 16, iters = 3, nProbe = 4, topK = 5,
      dim = 64, g = Grid, trainFilter = "id % 10 <> 0"),
    // v34: the full-corpus build replay with the deleted ids excluded
    // from the candidate scoring (frozen centroids — deletion never
    // retrains the quantizer).
    "v34_ivf_delete" -> ivfOracle(k = 16, iters = 3, nProbe = 4,
      topK = 5, dim = 64, g = Grid,
      postingFilter = Some("o.nid % 20 <> 3")),
    // v32: the v08 replay + the drift/repair decision + both probes
    // closed to micro-recalls (τ pinned to 0.012 on both sides).
    "v32_ivf_repair" -> ivfRepairOracle(k = 16, iters = 3, nProbe = 4,
      topK = 5, dim = 64, g = Grid, tau = "0.012"),
    // v31 answers the identical batch question as v08 (same train
    // slice, same frozen-centroid appends, same probe) — the oracle is
    // re-registered VERBATIM, never respelled (the e57 = e27 doctrine).
    "v31_stream_ivf_append" -> ivfOracle(k = 16, iters = 3, nProbe = 4,
      topK = 5, dim = 64, g = Grid, trainFilter = "id % 10 <> 0"),
    // v02: the FULL LSH pipeline replayed in SQL — md5-seeded hyperplane
    // weights (bit-identical doubles: 15-hex md5 / 2^59 − 1), sequential
    // list_dot_product sign bits packed per 4-plane table, any-table
    // collision candidates, exact cosine re-rank. Plane p = t*4+b.
    "v02_ann_lsh" ->
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
                    FROM embeddings),
         pw AS (
           SELECT p.p, j.j,
             CAST(concat('0x',
                 substr(md5('hp:' || p.p || ':' || j.j), 1, 15)) AS BIGINT)
               / 576460752303423488.0 - 1.0 AS w
           FROM generate_series(0, 95) p(p), generate_series(0, 63) j(j)),
         pl AS (SELECT p, list(w ORDER BY j) AS wl FROM pw GROUP BY p),
         sig AS (
           SELECT v.vec_id, CAST(pl.p // 4 AS INTEGER) AS tbl,
             sum(CASE WHEN list_dot_product(v.e, pl.wl) >= 0
                 THEN (1::BIGINT << (pl.p % 4)) ELSE 0 END) AS bucket
           FROM v, pl GROUP BY 1, 2),
         cand AS (
           SELECT DISTINCT q.vec_id AS qid, c.vec_id AS nid
           FROM sig c JOIN sig q ON c.tbl = q.tbl AND c.bucket = q.bucket
           WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id),
         scored AS (
           SELECT cand.qid, cand.nid,
             list_cosine_similarity(cv.e, qv.e) AS sim
           FROM cand
             JOIN v cv ON cv.vec_id = cand.nid
             JOIN v qv ON qv.vec_id = cand.qid)
         SELECT qid,
           CAST(row_number() OVER (PARTITION BY qid
             ORDER BY sim DESC, nid ASC) AS INTEGER) AS rk,
           nid, round(sim, 6) AS sim
         FROM scored QUALIFY rk <= 5 ORDER BY qid, rk""",
    // floor(x*1e6+0.5)/1e6 mirrors TextOps.round6 bit-for-bit (round()
    // disagrees between engines on half-way doubles).
    "v05_group_centroid" ->
      """WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
                    FROM embeddings),
         ex AS (SELECT vec_id, label, g.i - 1 AS pos, e[g.i] AS v
                FROM v, generate_series(1, 64) AS g(i)),
         cent AS (SELECT label, pos, avg(v) AS c FROM ex GROUP BY 1, 2),
         agg AS (SELECT ex.vec_id, ex.label, sum(ex.v * cent.c) AS dot,
                   sum(ex.v * ex.v) AS nv, sum(cent.c * cent.c) AS nc
                 FROM ex JOIN cent
                   ON ex.label = cent.label AND ex.pos = cent.pos
                 GROUP BY 1, 2)
         SELECT vec_id, label,
           floor(dot / sqrt(nv * nc) * 1e6 + 0.5) / 1e6 AS sim
         FROM agg ORDER BY vec_id""",
    // v20: v07's component aggregation split by the id-parity half,
    // closed by the same cosine spelling.
    "v20_centroid_drift" ->
      """WITH v AS (SELECT label, vec_id % 2 AS half,
             CAST(embedding AS DOUBLE[]) AS e
           FROM embeddings),
         ex AS (SELECT label, half, g.i - 1 AS pos, e[g.i] AS v
           FROM v, generate_series(1, 64) AS g(i)),
         cent AS (SELECT label, half, pos, avg(v) AS c
           FROM ex GROUP BY 1, 2, 3),
         p AS (SELECT a.label,
             sum(a.c * b.c) AS dot, sum(a.c * a.c) AS n1,
             sum(b.c * b.c) AS n2
           FROM cent a JOIN cent b
             ON a.label = b.label AND a.pos = b.pos
           WHERE a.half = 0 AND b.half = 1
           GROUP BY 1)
         SELECT label, floor(dot / sqrt(n1 * n2) * 1e6 + 0.5) / 1e6
           AS drift_cos6
         FROM p ORDER BY label""",
    "v07_centroid_matrix" ->
      """WITH v AS (SELECT label, CAST(embedding AS DOUBLE[]) AS e
                    FROM embeddings),
         ex AS (SELECT label, g.i - 1 AS pos, e[g.i] AS v
                FROM v, generate_series(1, 64) AS g(i)),
         cent AS (SELECT label, pos, avg(v) AS c FROM ex GROUP BY 1, 2),
         p AS (SELECT a.label AS l1, b.label AS l2,
                 sum(a.c * b.c) AS dot, sum(a.c * a.c) AS n1,
                 sum(b.c * b.c) AS n2
               FROM cent a JOIN cent b
                 ON a.pos = b.pos AND a.label <= b.label
               GROUP BY 1, 2)
         SELECT l1, l2, floor(dot / sqrt(n1 * n2) * 1e6 + 0.5) / 1e6 AS cos
         FROM p ORDER BY l1, l2""",
    "v11_pca" -> pcaOracle(dim = 64, iters = 8, g = Grid),
    "v22_pq_distortion" -> pqDistortionOracle(m = 8, codebook = 16,
      iters = 3, subDim = 8, g = Grid),
    // v23: identical sign-mask packing (exact integer sums of 2^i) and
    // xor+popcount ranking — no grid anywhere.
    "v23_binary_hamming" -> BinaryHammingSql,
    "v25_nprobe_curve" -> nprobeCurveOracle(k = 16, iters = 3,
      maxProbe = 8, topK = 5, dim = 64, g = Grid),
    // v26: the grid-normalized exact dots closed by a τ filter; same
    // snap/round discipline as the kNN replays.
    "v26_range_search" ->
      s"""WITH v0 AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS e0
             FROM embeddings),
         nrm AS (SELECT id,
             list_transform(e0, x -> floor(x / nn * $GridS + 0.5) / $GridS)
               AS e
           FROM (SELECT id, e0, sqrt(list_dot_product(e0, e0)) AS nn
                 FROM v0)),
         q AS (SELECT * FROM nrm WHERE id < 10)
         SELECT q.id AS qid, c.id AS nid,
           floor(list_dot_product(c.e, q.e) * 1e6 + 0.5) / 1e6 AS sim
         FROM nrm c JOIN q ON c.id <> q.id
         WHERE list_dot_product(c.e, q.e) >= 0.3
         ORDER BY qid, nid""",
    // v24: the v16 recall closing over the binary ranking — what does
    // 32× compression cost in neighbors?
    "v24_binary_recall" ->
      s"""WITH ap AS (SELECT qid, nid FROM ($BinaryHammingSql) t),
         ex AS (SELECT qid, nid FROM ($KnnSql) t2),
         h AS (SELECT ex.qid, CAST(count(*) AS BIGINT) AS hits
           FROM ex JOIN ap ON ex.qid = ap.qid AND ex.nid = ap.nid
           GROUP BY 1),
         kk AS (SELECT qid, CAST(count(*) AS BIGINT) AS k
           FROM ex GROUP BY 1)
         SELECT kk.qid, CAST(COALESCE(hits, 0) AS BIGINT) AS hits, k,
           floor(CAST(COALESCE(hits, 0) AS DOUBLE) / k * 1e6 + 0.5)
             / 1e6 AS recall6
         FROM kk LEFT JOIN h ON kk.qid = h.qid ORDER BY kk.qid""",
    "v12_pq" -> pqOracle(m = 8, codebook = 16, iters = 3, subDim = 8,
      topK = 5, g = Grid),
    "v13_ivf_pq" -> ivfPqOracle(nClusters = 16, nProbe = 4, m = 8,
      codebook = 16, iters = 3, subDim = 8, topK = 5, g = Grid),
    // v19: the same replay with BOTH trainings restricted to the 90%
    // build slice; codes/postings still cover every vector.
    "v19_ivfpq_append" -> ivfPqOracle(nClusters = 16, nProbe = 4, m = 8,
      codebook = 16, iters = 3, subDim = 8, topK = 5, g = Grid,
      trainFilter = "id % 10 <> 0"),
    // v16: the IVF and brute-force replays composed as derived tables
    // (nested WITH) and closed by the semi-join hit count.
    "v27_filtered_ann" -> FilteredIvfSql,
    "v29_silhouette" ->
      silhouetteOracle(k = 16, iters = 3, dim = 64, g = Grid),
    // v30: the two replays closed by first-true-hit rank per query.
    "v30_mrr" ->
      s"""WITH ap AS (SELECT qid, rk, nid FROM ($IvfSql) t),
         ex AS (SELECT qid, nid FROM ($KnnSql) t2),
         fh AS (SELECT ap.qid, CAST(min(ap.rk) AS INTEGER) AS first_rank
           FROM ap JOIN ex ON ap.qid = ex.qid AND ap.nid = ex.nid
           GROUP BY 1),
         qq AS (SELECT DISTINCT qid FROM ex)
         SELECT qq.qid, first_rank,
           CASE WHEN first_rank IS NOT NULL
             THEN CAST(floor(1e6 / first_rank + 0.5) AS BIGINT)
             ELSE 0 END AS rr_u
         FROM qq LEFT JOIN fh ON qq.qid = fh.qid ORDER BY qq.qid""",
    // v28: v16's recall close over the two FILTERED replays.
    "v28_filtered_recall" ->
      s"""WITH ap AS (SELECT qid, nid FROM ($FilteredIvfSql) t),
         ex AS (SELECT qid, nid FROM ($FilteredKnnSql) t2),
         h AS (SELECT ex.qid, CAST(count(*) AS BIGINT) AS hits
           FROM ex JOIN ap ON ex.qid = ap.qid AND ex.nid = ap.nid
           GROUP BY 1),
         kk AS (SELECT qid, CAST(count(*) AS BIGINT) AS k
           FROM ex GROUP BY 1)
         SELECT kk.qid, CAST(COALESCE(hits, 0) AS BIGINT) AS hits, k,
           floor(CAST(COALESCE(hits, 0) AS DOUBLE) / k * 1e6 + 0.5)
             / 1e6 AS recall6
         FROM kk LEFT JOIN h ON kk.qid = h.qid ORDER BY kk.qid""",
    "v16_recall_eval" ->
      s"""WITH ap AS (SELECT qid, nid FROM ($IvfSql) t),
         ex AS (SELECT qid, nid FROM ($KnnSql) t2),
         h AS (SELECT ex.qid, CAST(count(*) AS BIGINT) AS hits
           FROM ex JOIN ap ON ex.qid = ap.qid AND ex.nid = ap.nid
           GROUP BY 1),
         kk AS (SELECT qid, CAST(count(*) AS BIGINT) AS k
           FROM ex GROUP BY 1)
         SELECT kk.qid, CAST(COALESCE(hits, 0) AS BIGINT) AS hits, k,
           floor(CAST(COALESCE(hits, 0) AS DOUBLE) / k * 1e6 + 0.5)
             / 1e6 AS recall6
         FROM kk LEFT JOIN h ON kk.qid = h.qid ORDER BY kk.qid""",
    // v18: candidate/pair-sim CTEs + the k greedy rounds unrolled; every
    // score is 0.5·rel − 0.5·max-sim of exact grid dots.
    "v18_mmr_rerank" -> mmrOracle(nCand = 20, k = 5, g = Grid),
    // v17: the same two replays closed by the pinned-integer DCG dot
    // product; rel = k − exact rank + 1, one division at the end.
    "v17_ndcg_eval" ->
      s"""WITH ap AS (SELECT qid, rk, nid FROM ($IvfSql) t),
         ex AS (SELECT qid, rk, nid FROM ($KnnSql) t2),
         kf AS (SELECT qid, CAST(count(*) AS BIGINT) AS k
           FROM ex GROUP BY 1),
         u(i, u) AS (VALUES (1, 1000000), (2, 630930), (3, 500000),
           (4, 430677), (5, 386853)),
         exk AS (SELECT ex.qid, ex.nid, ex.rk, k - rk + 1 AS rel
           FROM ex JOIN kf USING (qid)),
         idcg AS (SELECT qid, CAST(sum(rel * u) AS BIGINT) AS idcg_u
           FROM exk JOIN u ON u.i = exk.rk GROUP BY 1),
         dcg AS (SELECT ap.qid,
             CAST(sum(COALESCE(rel, 0) * u) AS BIGINT) AS dcg_u
           FROM ap JOIN u ON u.i = ap.rk
           LEFT JOIN exk ON exk.qid = ap.qid AND exk.nid = ap.nid
           GROUP BY 1)
         SELECT idcg.qid, CAST(COALESCE(dcg_u, 0) AS BIGINT) AS dcg_u,
           idcg_u,
           floor(CAST(COALESCE(dcg_u, 0) AS DOUBLE) / idcg_u * 1e6 + 0.5)
             / 1e6 AS ndcg6
         FROM idcg LEFT JOIN dcg USING (qid) ORDER BY idcg.qid""",
    // v14/v15 share v12/v13's oracles: identical parameters, and the
    // grid-snapped codebooks/codes survive the parquet round-trip
    // exactly (the v04-shares-v03 pattern).
    "v14_pq_persist" -> pqOracle(m = 8, codebook = 16, iters = 3,
      subDim = 8, topK = 5, g = Grid),
    // v33: the PQ replay at topK=25 nests as the shortlist; the refine
    // re-ranks those candidates with grid-exact dots, top-5.
    "v33_pq_refine" -> {
      val gs = f"$Grid%.1f"
      s"""WITH cand AS (SELECT qid, nid FROM (
             ${pqOracle(m = 8, codebook = 16, iters = 3, subDim = 8,
               topK = 25, g = Grid)}) t),
           rv AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS e0
             FROM embeddings),
           rn AS (SELECT id,
               list_transform(e0, x -> floor(x / nn * $gs + 0.5) / $gs)
                 AS e
             FROM (SELECT id, e0, sqrt(list_dot_product(e0, e0)) AS nn
                   FROM rv)),
           ref AS (SELECT c.qid, c.nid,
               list_dot_product(a.e, b.e) AS sim
             FROM cand c JOIN rn a ON a.id = c.nid
             JOIN rn b ON b.id = c.qid)
           SELECT qid, CAST(row_number() OVER (PARTITION BY qid
               ORDER BY sim DESC, nid ASC) AS INTEGER) AS rk,
             nid, floor(sim * 1e6 + 0.5) / 1e6 AS sim
           FROM ref QUALIFY rk <= 5 ORDER BY qid, rk"""
    },
    "v15_ivfpq_persist" -> ivfPqOracle(nClusters = 16, nProbe = 4, m = 8,
      codebook = 16, iters = 3, subDim = 8, topK = 5, g = Grid)
  )

  /** DuckDB replay of grid-portable PQ-ADC: per subspace, the Euclidean
    * k-means is unrolled (assignment maximizes `2·x·c − ‖c‖²`, ties →
    * larger cluster — the greatest-struct mirror; means floor-snap to
    * the grid, NO re-normalization), then codes and the per-query LUT
    * union across subspaces and the ADC sum joins them on (s, code).
    * Everything after the grid projection is exact, so the approximate
    * index hash-matches with no rounding grid at all. */
  /** The per-subspace PQ training/encode/LUT CTE block, shared by the
    * v12 (plain PQ) and v13 (IVF-PQ) oracle builders. */
  /** PQ training/coding CTE block. Training (seeds + Lloyd rounds)
    * reads `tsub$s` — the sub-slices of the `trn` CTE the caller must
    * define (= `nrm` for full-corpus training, a filtered subset for
    * the append-maintenance replay); codes and LUT always read
    * `sub$s` (ALL vectors). */
  private def pqSubCtes(m: Int, codebook: Int, iters: Int, subDim: Int,
                        gs: String): String = {
    def sub(s: Int): String = {
      val lo = s * subDim + 1
      val hi = (s + 1) * subDim
      def it(i: Int) = s"""
        asg${s}_$i AS (SELECT id, e, cluster FROM (
            SELECT n.id, n.e, c.cluster,
              row_number() OVER (PARTITION BY n.id ORDER BY
                2 * list_dot_product(n.e, c.c)
                  - list_dot_product(c.c, c.c) DESC,
                c.cluster DESC) AS rn
            FROM tsub$s n, cent${s}_$i c) WHERE rn = 1),
        avg${s}_$i AS (SELECT a.cluster, g.i - 1 AS pos,
            floor(avg(a.e[g.i]) * $gs + 0.5) / $gs AS mn
          FROM asg${s}_$i a, generate_series(1, $subDim) g(i)
          GROUP BY 1, 2),
        cent${s}_${i + 1} AS (SELECT p.cluster, coalesce(u.c, p.c) AS c
          FROM cent${s}_$i p LEFT JOIN (
            SELECT cluster, list(mn ORDER BY pos) AS c
            FROM avg${s}_$i GROUP BY 1) u USING (cluster)),"""
      s"""
        sub$s AS (SELECT id, e[$lo:$hi] AS e FROM nrm),
        tsub$s AS (SELECT id, e[$lo:$hi] AS e FROM trn),
        cent${s}_0 AS (
          SELECT CAST(row_number() OVER (ORDER BY id) AS INTEGER) - 1
              AS cluster, e AS c
          FROM (SELECT id, e FROM tsub$s ORDER BY id LIMIT $codebook)),
        ${(0 until iters).map(it).mkString}
        codes$s AS (SELECT id AS nid, $s AS s, cluster AS code FROM (
            SELECT n.id, c.cluster,
              row_number() OVER (PARTITION BY n.id ORDER BY
                2 * list_dot_product(n.e, c.c)
                  - list_dot_product(c.c, c.c) DESC,
                c.cluster DESC) AS rn
            FROM sub$s n, cent${s}_$iters c) WHERE rn = 1),
        lut$s AS (SELECT n.id AS qid, $s AS s, c.cluster AS code,
            list_dot_product(n.e, c.c) AS v
          FROM sub$s n, cent${s}_$iters c WHERE n.id < 10),"""
    }
    s"""${(0 until m).map(sub).mkString}
         codes AS (${(0 until m).map(s => s"SELECT * FROM codes$s")
      .mkString(" UNION ALL ")}),
         lut AS (${(0 until m).map(s => s"SELECT * FROM lut$s")
      .mkString(" UNION ALL ")}),"""
  }

  /** v22 oracle: [[pqSubCtes]]'s trained codebooks + codes joined back
    * to the sub-slices; per-row distance in the IDENTICAL association
    * (a − b·2 + c over list_dot_product), 1e-9-unit BIGINT snap, exact
    * integer per-subspace totals. */
  private def pqDistortionOracle(m: Int, codebook: Int, iters: Int,
                                 subDim: Int, g: Double): String = {
    val gs = f"$g%.1f"
    val dCtes = (0 until m).map(s => s"""
         d$s AS (SELECT $s AS s,
             CAST(floor((list_dot_product(n.e, n.e)
               - list_dot_product(c.c, n.e) * 2.0
               + list_dot_product(c.c, c.c)) * 1e9 + 0.5) AS BIGINT)
               AS d2u
           FROM sub$s n
           JOIN codes$s k ON n.id = k.nid
           JOIN cent${s}_$iters c ON c.cluster = k.code)""").mkString(",")
    s"""WITH v0 AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS e0
             FROM embeddings),
         nrm AS (SELECT id,
             list_transform(e0, x -> floor(x / nn * $gs + 0.5) / $gs) AS e
           FROM (SELECT id, e0, sqrt(list_dot_product(e0, e0)) AS nn
                 FROM v0)),
         trn AS (SELECT * FROM nrm),
         ${pqSubCtes(m, codebook, iters, subDim, gs)}
         $dCtes,
         du AS (${(0 until m).map(s => s"SELECT * FROM d$s")
      .mkString(" UNION ALL ")})
         SELECT s, count(*) AS n, CAST(sum(d2u) AS BIGINT) AS sum_d2u,
           floor(CAST(sum(d2u) AS DOUBLE) / CAST(count(*) AS DOUBLE)
             / 1e9 * 1e6 + 0.5) / 1e6 AS mse6
         FROM du GROUP BY s ORDER BY s"""
  }

  /** v25 oracle: ONE unrolled k-means replay (the ivfOracle head), then
    * every nprobe tier closes from the same probe ranking — candidates
    * are postings whose probed-cluster rank ≤ np; micro-recall divides
    * exact integer totals. */
  /** v35 oracle: the standard dyadic k-means replay head (the ivfOracle
    * chain through the full-corpus assignment), closed by per-cluster
    * sizes + (cluster, term) tf counts + the tf/df rank — the one
    * division per term is correctly rounded in both engines and the
    * (score DESC, term ASC) window is a total order. */
  private def clusterTermsOracle(k: Int, iters: Int, dim: Int, g: Double,
                                 topTerms: Int): String = {
    val gs = f"$g%.1f"
    def iterSql(i: Int) = s"""
      asg$i AS (
        SELECT id, e, cluster FROM (
          SELECT n.id, n.e, c.cluster,
            row_number() OVER (PARTITION BY n.id
              ORDER BY list_dot_product(n.e, c.c) DESC, c.cluster DESC) AS rn
          FROM nrm n, cent$i c) WHERE rn = 1),
      avg$i AS (
        SELECT a.cluster, g.i - 1 AS pos,
          floor(avg(a.e[g.i]) * $gs + 0.5) / $gs AS m
        FROM asg$i a, generate_series(1, $dim) g(i) GROUP BY 1, 2),
      raw$i AS (
        SELECT p.cluster, coalesce(u.c, p.c) AS c
        FROM cent$i p LEFT JOIN (
          SELECT cluster, list(m ORDER BY pos) AS c FROM avg$i GROUP BY 1
        ) u USING (cluster)),
      cent${i + 1} AS (
        SELECT r.cluster,
          CASE WHEN n.nn = 0 THEN r.c
            ELSE list_transform(r.c,
              x -> floor(x / n.nn * $gs + 0.5) / $gs) END AS c
        FROM raw$i r JOIN (
          SELECT cluster, sqrt(sum(x * x)) AS nn
          FROM (SELECT cluster, unnest(c) AS x FROM raw$i) GROUP BY 1
        ) n USING (cluster))"""
    s"""WITH
      v0 AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS e0
             FROM embeddings),
      nrm AS (
        SELECT id, list_transform(e0,
          x -> floor(x / nn * $gs + 0.5) / $gs) AS e
        FROM (SELECT id, e0,
          sqrt(list_dot_product(e0, e0)) AS nn FROM v0)),
      cent0 AS (
        SELECT CAST(row_number() OVER (ORDER BY id) AS INTEGER) - 1
            AS cluster, e AS c
        FROM (SELECT id, e FROM nrm ORDER BY id LIMIT $k)),
      ${(0 until iters).map(iterSql).mkString(",")},
      asg AS (
        SELECT id, cluster FROM (
          SELECT n.id, c.cluster,
            row_number() OVER (PARTITION BY n.id
              ORDER BY list_dot_product(n.e, c.c) DESC, c.cluster DESC) AS rn
          FROM nrm n, cent$iters c) WHERE rn = 1),
      toks AS (SELECT t.doc_id, u.t AS t
        FROM (SELECT doc_id,
            list_filter(string_split(lower(text), ' '), x -> x <> '') AS ts
          FROM documents) t, LATERAL unnest(ts) AS u(t)),
      tf AS (SELECT a.cluster, toks.t,
          CAST(count(*) AS BIGINT) AS tf
        FROM toks JOIN asg a ON a.id = toks.doc_id GROUP BY 1, 2),
      dfq AS (SELECT t, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
      sizes AS (SELECT cluster, CAST(count(*) AS BIGINT) AS n_docs
        FROM asg GROUP BY 1),
      rk AS (SELECT tf.cluster, tf.t AS term, tf.tf, dfq.df,
          CAST(row_number() OVER (PARTITION BY tf.cluster
            ORDER BY tf.tf * 1.0 / dfq.df DESC, tf.t ASC) AS INTEGER)
            AS "rank"
        FROM tf JOIN dfq USING (t))
      SELECT rk.cluster, s.n_docs, rk."rank", rk.term, rk.tf, rk.df
      FROM rk JOIN sizes s USING (cluster)
      WHERE rk."rank" <= $topTerms
      ORDER BY rk.cluster, rk."rank""""
  }

  /** v29 oracle: the standard dyadic k-means replay head (the ivfOracle
    * chain through `posting`), closed by the per-vector all-centroid
    * distance frame and the exact 1e-6-unit silhouette rollup. */
  private def silhouetteOracle(k: Int, iters: Int, dim: Int,
                               g: Double): String = {
    val gs = f"$g%.1f"
    def iterSql(i: Int) = s"""
      asg$i AS (
        SELECT id, e, cluster FROM (
          SELECT n.id, n.e, c.cluster,
            row_number() OVER (PARTITION BY n.id
              ORDER BY list_dot_product(n.e, c.c) DESC, c.cluster DESC) AS rn
          FROM trn n, cent$i c) WHERE rn = 1),
      avg$i AS (
        SELECT a.cluster, g.i - 1 AS pos,
          floor(avg(a.e[g.i]) * $gs + 0.5) / $gs AS m
        FROM asg$i a, generate_series(1, $dim) g(i) GROUP BY 1, 2),
      raw$i AS (
        SELECT p.cluster, coalesce(u.c, p.c) AS c
        FROM cent$i p LEFT JOIN (
          SELECT cluster, list(m ORDER BY pos) AS c FROM avg$i GROUP BY 1
        ) u USING (cluster)),
      cent${i + 1} AS (
        SELECT r.cluster,
          CASE WHEN n.nn = 0 THEN r.c
            ELSE list_transform(r.c,
              x -> floor(x / n.nn * $gs + 0.5) / $gs) END AS c
        FROM raw$i r JOIN (
          SELECT cluster, sqrt(sum(x * x)) AS nn
          FROM (SELECT cluster, unnest(c) AS x FROM raw$i) GROUP BY 1
        ) n USING (cluster))"""
    s"""WITH
      v0 AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS e0
             FROM embeddings),
      nrm AS (
        SELECT id, list_transform(e0,
          x -> floor(x / nn * $gs + 0.5) / $gs) AS e
        FROM (SELECT id, e0, sqrt(list_dot_product(e0, e0)) AS nn FROM v0)),
      trn AS (SELECT * FROM nrm),
      cent0 AS (
        SELECT CAST(row_number() OVER (ORDER BY id) AS INTEGER) - 1
            AS cluster, e AS c
        FROM (SELECT id, e FROM trn ORDER BY id LIMIT $k)),
      ${(0 until iters).map(iterSql).mkString(",")},
      posting AS (
        SELECT id AS nid, e AS ce, cluster FROM (
          SELECT n.id, n.e, c.cluster,
            row_number() OVER (PARTITION BY n.id
              ORDER BY list_dot_product(n.e, c.c) DESC, c.cluster DESC) AS rn
          FROM nrm n, cent$iters c) WHERE rn = 1),
      dmat AS (
        SELECT p.nid, p.cluster AS own, c.cluster AS j,
          1.0 - list_dot_product(p.ce, c.c) AS dist
        FROM posting p, cent$iters c),
      ab AS (
        SELECT nid, max(own) AS cluster,
          max(CASE WHEN j = own THEN dist END) AS a,
          min(CASE WHEN j <> own THEN dist END) AS b
        FROM dmat GROUP BY nid),
      su AS (
        SELECT cluster, CAST(floor((CASE WHEN GREATEST(a, b) = 0 THEN 0.0
            ELSE (b - a) / GREATEST(a, b) END) * 1e6 + 0.5) AS BIGINT)
            AS s_u
        FROM ab)
      SELECT cluster, CAST(count(*) AS BIGINT) AS n,
        floor(CAST(sum(s_u) AS DOUBLE) / 1e6 / count(*) * 1e6 + 0.5)
          / 1e6 AS mean_sil6
      FROM su GROUP BY 1 ORDER BY 1"""
  }

  private def nprobeCurveOracle(k: Int, iters: Int, maxProbe: Int,
                                topK: Int, dim: Int, g: Double): String = {
    val gs = f"$g%.1f"
    def iterSql(i: Int) = s"""
      asg$i AS (
        SELECT id, e, cluster FROM (
          SELECT n.id, n.e, c.cluster,
            row_number() OVER (PARTITION BY n.id
              ORDER BY list_dot_product(n.e, c.c) DESC, c.cluster DESC) AS rn
          FROM trn n, cent$i c) WHERE rn = 1),
      avg$i AS (
        SELECT a.cluster, g.i - 1 AS pos,
          floor(avg(a.e[g.i]) * $gs + 0.5) / $gs AS m
        FROM asg$i a, generate_series(1, $dim) g(i) GROUP BY 1, 2),
      raw$i AS (
        SELECT p.cluster, coalesce(u.c, p.c) AS c
        FROM cent$i p LEFT JOIN (
          SELECT cluster, list(m ORDER BY pos) AS c FROM avg$i GROUP BY 1
        ) u USING (cluster)),
      cent${i + 1} AS (
        SELECT r.cluster,
          CASE WHEN n.nn = 0 THEN r.c
            ELSE list_transform(r.c,
              x -> floor(x / n.nn * $gs + 0.5) / $gs) END AS c
        FROM raw$i r JOIN (
          SELECT cluster, sqrt(sum(x * x)) AS nn
          FROM (SELECT cluster, unnest(c) AS x FROM raw$i) GROUP BY 1
        ) n USING (cluster))"""
    s"""WITH
      v0 AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS e0
             FROM embeddings),
      nrm AS (
        SELECT id, list_transform(e0,
          x -> floor(x / nn * $gs + 0.5) / $gs) AS e
        FROM (SELECT id, e0, sqrt(list_dot_product(e0, e0)) AS nn FROM v0)),
      trn AS (SELECT * FROM nrm),
      cent0 AS (
        SELECT CAST(row_number() OVER (ORDER BY id) AS INTEGER) - 1
            AS cluster, e AS c
        FROM (SELECT id, e FROM trn ORDER BY id LIMIT $k)),
      ${(0 until iters).map(iterSql).mkString(",")},
      posting AS (
        SELECT id AS nid, e AS ce, cluster FROM (
          SELECT n.id, n.e, c.cluster,
            row_number() OVER (PARTITION BY n.id
              ORDER BY list_dot_product(n.e, c.c) DESC, c.cluster DESC) AS rn
          FROM nrm n, cent$iters c) WHERE rn = 1),
      probeAll AS (
        SELECT qid, qe, cluster, crk FROM (
          SELECT n.id AS qid, n.e AS qe, c.cluster,
            row_number() OVER (PARTITION BY n.id
              ORDER BY list_dot_product(n.e, c.c) DESC, c.cluster ASC) AS crk
          FROM nrm n, cent$iters c WHERE n.id < 10) WHERE crk <= $maxProbe),
      np(np) AS (VALUES (1), (2), (4), (8)),
      scored AS (
        SELECT np.np, p.qid, o.nid, list_dot_product(o.ce, p.qe) AS sim
        FROM posting o JOIN probeAll p USING (cluster) CROSS JOIN np
        WHERE o.nid <> p.qid AND p.crk <= np.np),
      ap AS (SELECT np, qid, nid FROM (
          SELECT *, row_number() OVER (PARTITION BY np, qid
            ORDER BY sim DESC, nid ASC) AS rk
          FROM scored) WHERE rk <= $topK),
      ex AS (SELECT qid, nid FROM ($KnnSql) t),
      h AS (SELECT np, CAST(count(*) AS BIGINT) AS hits
        FROM ap JOIN ex USING (qid, nid) GROUP BY 1),
      nr AS (SELECT CAST(count(*) AS BIGINT) AS n_rel FROM ex)
      SELECT CAST(np.np AS INTEGER) AS nprobe,
        CAST(COALESCE(hits, 0) AS BIGINT) AS n_hits, n_rel,
        floor(CAST(COALESCE(hits, 0) AS DOUBLE) / n_rel * 1e6 + 0.5)
          / 1e6 AS recall6
      FROM np LEFT JOIN h ON h.np = np.np CROSS JOIN nr
      ORDER BY nprobe"""
  }

  /** DuckDB replay of grid-portable PQ-ADC (see [[pqSubCtes]]). */
  private def pqOracle(m: Int, codebook: Int, iters: Int, subDim: Int,
                       topK: Int, g: Double): String = {
    val gs = f"$g%.1f"
    s"""WITH v0 AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS e0
             FROM embeddings),
         nrm AS (SELECT id,
             list_transform(e0, x -> floor(x / nn * $gs + 0.5) / $gs) AS e
           FROM (SELECT id, e0, sqrt(list_dot_product(e0, e0)) AS nn
                 FROM v0)),
         trn AS (SELECT * FROM nrm),
         ${pqSubCtes(m, codebook, iters, subDim, gs)}
         sc AS (SELECT l.qid, o.nid, sum(l.v) AS adc
           FROM codes o JOIN lut l ON o.s = l.s AND o.code = l.code
           WHERE o.nid <> l.qid GROUP BY 1, 2),
         ranked AS (SELECT qid,
             CAST(row_number() OVER (PARTITION BY qid
               ORDER BY adc DESC, nid ASC) AS INTEGER) AS rk,
             nid, adc
           FROM sc)
         SELECT qid, rk, nid, adc FROM ranked WHERE rk <= $topK
         ORDER BY qid, rk"""
  }

  /** DuckDB replay of grid-portable IVF-PQ: the v03 coarse spherical
    * k-means unrolled (ccent CTEs — mean → grid → renormalize → grid,
    * ties → larger cluster on assignment / smaller on probe) bounds the
    * candidates; the shared [[pqSubCtes]] block trains codebooks,
    * encodes, and builds the LUT; ADC sums close over candidates only.
    * Entirely exact on the grid — no rounding anywhere. */
  private def ivfPqOracle(nClusters: Int, nProbe: Int, m: Int,
                          codebook: Int, iters: Int, subDim: Int,
                          topK: Int, g: Double,
                          trainFilter: String = "TRUE"): String = {
    val gs = f"$g%.1f"
    val dim = m * subDim
    def coarseIter(i: Int) = s"""
        casg$i AS (SELECT id, e, cluster FROM (
            SELECT n.id, n.e, c.cluster,
              row_number() OVER (PARTITION BY n.id
                ORDER BY list_dot_product(n.e, c.c) DESC,
                  c.cluster DESC) AS rn
            FROM trn n, ccent$i c) WHERE rn = 1),
        cavg$i AS (SELECT a.cluster, g.i - 1 AS pos,
            floor(avg(a.e[g.i]) * $gs + 0.5) / $gs AS mn
          FROM casg$i a, generate_series(1, $dim) g(i) GROUP BY 1, 2),
        craw$i AS (SELECT p.cluster, coalesce(u.c, p.c) AS c
          FROM ccent$i p LEFT JOIN (
            SELECT cluster, list(mn ORDER BY pos) AS c
            FROM cavg$i GROUP BY 1) u USING (cluster)),
        ccent${i + 1} AS (SELECT r.cluster,
            CASE WHEN n.nn = 0 THEN r.c
              ELSE list_transform(r.c,
                x -> floor(x / n.nn * $gs + 0.5) / $gs) END AS c
          FROM craw$i r JOIN (
            SELECT cluster, sqrt(sum(x * x)) AS nn
            FROM (SELECT cluster, unnest(c) AS x FROM craw$i)
            GROUP BY 1) n USING (cluster)),"""
    s"""WITH v0 AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS e0
             FROM embeddings),
         nrm AS (SELECT id,
             list_transform(e0, x -> floor(x / nn * $gs + 0.5) / $gs) AS e
           FROM (SELECT id, e0, sqrt(list_dot_product(e0, e0)) AS nn
                 FROM v0)),
         trn AS (SELECT * FROM nrm WHERE $trainFilter),
         ccent0 AS (
           SELECT CAST(row_number() OVER (ORDER BY id) AS INTEGER) - 1
               AS cluster, e AS c
           FROM (SELECT id, e FROM trn ORDER BY id LIMIT $nClusters)),
         ${(0 until iters).map(coarseIter).mkString}
         posting AS (SELECT id AS nid, cluster FROM (
             SELECT n.id, c.cluster,
               row_number() OVER (PARTITION BY n.id
                 ORDER BY list_dot_product(n.e, c.c) DESC,
                   c.cluster DESC) AS rn
             FROM nrm n, ccent$iters c) WHERE rn = 1),
         probe AS (SELECT qid, cluster FROM (
             SELECT n.id AS qid, c.cluster,
               row_number() OVER (PARTITION BY n.id
                 ORDER BY list_dot_product(n.e, c.c) DESC,
                   c.cluster ASC) AS crk
             FROM nrm n, ccent$iters c WHERE n.id < 10)
           WHERE crk <= $nProbe),
         cand AS (SELECT p.qid, o.nid
           FROM posting o JOIN probe p USING (cluster)
           WHERE o.nid <> p.qid),
         ${pqSubCtes(m, codebook, iters, subDim, gs)}
         sc AS (SELECT c.qid, c.nid, sum(l.v) AS adc
           FROM cand c JOIN codes o ON o.nid = c.nid
           JOIN lut l ON l.qid = c.qid AND l.s = o.s AND l.code = o.code
           GROUP BY 1, 2),
         ranked AS (SELECT qid,
             CAST(row_number() OVER (PARTITION BY qid
               ORDER BY adc DESC, nid ASC) AS INTEGER) AS rk,
             nid, adc
           FROM sc)
         SELECT qid, rk, nid, adc FROM ranked WHERE rk <= $topK
         ORDER BY qid, rk"""
  }

  /** DuckDB replay of the grid-portable power-iteration PCA: same nrm
    * grid projection as the IVF oracle, the dim² Gram cells over grid
    * values (order-free exact sums), then the iterations UNROLLED —
    * each matvec and normalized vector snapped to the 1e-9 floor grid
    * exactly like the Spark driver loop, so association drift between
    * the two engines' summation orders cannot compound. */
  private def pcaOracle(dim: Int, iters: Int, g: Double): String = {
    val gs = f"$g%.1f"
    def it(r: Int) = s"""
         t$r AS (SELECT g.i AS i,
             floor(sum(g.g * w.w) * 1e9 + 0.5) / 1e9 AS t
           FROM gm g JOIN w${r - 1} w ON g.j = w.i GROUP BY 1),
         w$r AS (SELECT i, floor(t / n.nn * 1e9 + 0.5) / 1e9 AS w
           FROM t$r, (SELECT sqrt(sum(t * t)) AS nn FROM t$r) n),"""
    s"""WITH v0 AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS e0
             FROM embeddings),
         nrm AS (SELECT id,
             list_transform(e0, x -> floor(x / nn * $gs + 0.5) / $gs) AS e
           FROM (SELECT id, e0, sqrt(list_dot_product(e0, e0)) AS nn
                 FROM v0)),
         cnt AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nrm),
         cell AS (SELECT gi.i - 1 AS i, gj.i - 1 AS j,
             sum(e[gi.i] * e[gj.i]) AS s
           FROM nrm, generate_series(1, $dim) gi(i),
             generate_series(1, $dim) gj(i)
           GROUP BY 1, 2),
         gm AS (SELECT i, j, s / (SELECT n FROM cnt) AS g FROM cell),
         w0 AS (SELECT gi.i - 1 AS i, CAST(1.0 AS DOUBLE) / $dim AS w
           FROM generate_series(1, $dim) gi(i)),
         ${(1 to iters).map(it).mkString}
         gw AS (SELECT g.i AS i,
             floor(sum(g.g * w.w) * 1e9 + 0.5) / 1e9 AS t
           FROM gm g JOIN w$iters w ON g.j = w.i GROUP BY 1),
         lam AS (SELECT floor(sum(w.w * t.t) * 1e6 + 0.5) / 1e6 AS lam6
           FROM w$iters w JOIN gw t USING (i)),
         wv AS (SELECT list(w ORDER BY i) AS wl FROM w$iters)
         SELECT nrm.id AS vec_id,
           floor(list_dot_product(nrm.e, wv.wl) * 1e6 + 0.5) / 1e6
             AS score6,
           lam.lam6
         FROM nrm CROSS JOIN wv CROSS JOIN lam ORDER BY vec_id"""
  }
}
