package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.TextOps._

/** Text-analysis queries over the `documents` fixture table, each with a
  * DuckDB oracle. Per-document metrics are single-scan projections; term
  * statistics explode tokens and aggregate (shuffle on term — the natural
  * partitioning for a 100 TB corpus where per-term state must meet anyway).
  */
object TextQueries {

  // spread: the heavy per-row text expressions and token/shingle explodes
  // otherwise run at the scan's file-split parallelism (one task on the
  // compacted fixtures; no-op at real scale — see DedupOps.spread).
  private def docs(s: SparkSession, d: String): DataFrame =
    graft.ops.DedupOps.spread(Tables.documents(s, d), "doc_id")


  /** Fixture text is pure ASCII English-ish words (round-8 doctrine), so
    * NO langId branch beyond `en` can fire on raw fixture bytes — the
    * script stage sees no non-Latin code points and the es/de/fr marker
    * stopwords never occur. Each labeled class therefore SPLICES its
    * detector signal in, identically on both engine sides (the round-8
    * splice pattern), sized to dominate deterministically:
    *  - zh: a Han prefix of floor(len/15)+1 chars of U+4E2D — clears the
    *    script stage's 5 % character-dominance rule at every length;
    *  - es/de/fr: their 5 marker stopwords repeated floor(ntok/4)+1
    *    times — 5·m > ntok ≥ (any other class's body count), so the
    *    spliced class strictly wins the marker comparison (the body DOES
    *    contain `the`/`is`, so beating en needs real dominance — which
    *    also exercises the tie order);
    *  - en: unspliced — the body's own `the/and/of/is` carry it.
    * All four Latin branches + the script stage are thereby validated
    * against the oracle (before round 13 only the en branch ever fired
    * on fixture bytes). */
  private val ZhChar = "\u4E2D"
  private def spliceLang(c: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val m = (floor(size(tokens(c)).cast("double") / lit(4)) + 1)
      .cast("int")
    def markers(ms: String) = concat(repeat(lit(ms), m), c)
    when(col("lang") === "zh",
      concat(repeat(lit(ZhChar),
        (floor(length(c) / lit(15)) + 1).cast("int")), lit(" "), c))
      .when(col("lang") === "es", markers("el la los de que "))
      .when(col("lang") === "de", markers("der die und das ist "))
      .when(col("lang") === "fr", markers("le les et est une "))
      .otherwise(c)
  }

  /** Multi-script langid acceptance rows (t32): one phrase per script
    * class + the four Latin stopword classes + a below-threshold mixed
    * row that must FALL BACK to the Latin stage. Shared by the Spark
    * gate (toDF) and the oracle (interpolated VALUES) — one source of
    * truth, so the bytes match on both engine sides by construction. */
  private val scriptSamples: Seq[(Long, String, String)] = Seq(
    (1L, "ja", "\u3053\u308C\u306F\u65E5\u672C\u8A9E\u306E\u30C6\u30AD\u30B9\u30C8\u3067\u3059"),
    (2L, "zh", "\u8FD9\u662F\u4E00\u4E2A\u4E2D\u6587\u6D4B\u8BD5\u6587\u6863\u5185\u5BB9"),
    (3L, "ko", "\uD55C\uAD6D\uC5B4 \uD14D\uC2A4\uD2B8 \uBB38\uC11C \uC785\uB2C8\uB2E4"),
    (4L, "ru", "\u044D\u0442\u043E \u0440\u0443\u0441\u0441\u043A\u0438\u0439 \u0442\u0435\u043A\u0441\u0442 \u0434\u043B\u044F \u043F\u0440\u043E\u0432\u0435\u0440\u043A\u0438"),
    (5L, "ar", "\u0647\u0630\u0627 \u0646\u0635 \u0639\u0631\u0628\u064A \u0644\u0644\u0627\u062E\u062A\u0628\u0627\u0631 \u0641\u0642\u0637"),
    (6L, "el", "\u03B1\u03C5\u03C4\u03BF \u03B5\u03B9\u03BD\u03B1\u03B9 \u03B5\u03BB\u03BB\u03B7\u03BD\u03B9\u03BA\u03BF \u03BA\u03B5\u03B9\u03BC\u03B5\u03BD\u03BF"),
    (7L, "he", "\u05D6\u05D4\u05D5 \u05D8\u05E7\u05E1\u05D8 \u05D1\u05E2\u05D1\u05E8\u05D9\u05EA \u05DC\u05D1\u05D3\u05D9\u05E7\u05D4"),
    (8L, "hi", "\u092F\u0939 \u0939\u093F\u0902\u0926\u0940 \u092E\u0947\u0902 \u090F\u0915 \u092A\u0930\u0940\u0915\u094D\u0937\u0923 \u0939\u0948"),
    (9L, "th", "\u0E19\u0E35\u0E48\u0E04\u0E37\u0E2D\u0E02\u0E49\u0E2D\u0E04\u0E27\u0E32\u0E21\u0E20\u0E32\u0E29\u0E32\u0E44\u0E17\u0E22"),
    (10L, "en", "the cat and the dog of the house is here"),
    (11L, "es", "el perro de la casa que ladra los dias"),
    (12L, "de", "der hund und die katze das haus ist da"),
    (13L, "fr", "le chat et les chiens est une belle chose"),
    (14L, "en", "mostly english words with a single \u4E2D character inside"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // HEAPS' LAW vocabulary-growth curve: distinct-token vocabulary vs
    // corpus size at five id-ordered prefixes (cutoffs from the doc_id
    // VALUE range — no global rank window, engine-exact) — the corpus
    // diversity datasheet (sublinear growth = healthy; a flattening
    // curve = the crawl is re-reading itself). One token first-
    // occurrence aggregate + two conditional 1-row rollups.
    "t29_heaps_curve" -> ((s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d)
      val b = docs.agg(min(col("doc_id")), max(col("doc_id"))).head() // 1-row id-range probe
      val (lo, hi) = (b.getLong(0), b.getLong(1))
      val fracs = Seq(0.1, 0.25, 0.5, 0.75, 1.0)
      val cuts = fracs.map(f => lo + math.floor(f * (hi - lo)).toLong)
      // token first-occurrence doc (tokens staged before the explode)
      val firsts = docs
        .select(col("doc_id"), tokens(col("text")).as("__ts"))
        .select(col("doc_id"), explode(col("__ts")).as("t"))
        .groupBy("t").agg(min(col("doc_id")).as("fd"))
      val vocAggs = cuts.map(c =>
        count(when(col("fd") <= c, 1)).as(s"v$c"))
      val voc = firsts.agg(vocAggs.head, vocAggs.tail: _*).head() // 1-row: |tiers| counts
      val tokAggs = cuts.flatMap(c => Seq(
        count(when(col("doc_id") <= c, 1)).as(s"d$c"),
        sum(when(col("doc_id") <= c, tokenCount(col("text")))
          .otherwise(0L)).as(s"n$c")))
      val tok = docs.agg(tokAggs.head, tokAggs.tail: _*).head() // 1-row: |tiers| sums
      fracs.indices.map { i =>
        (fracs(i), cuts(i), tok.getLong(2 * i), tok.getLong(2 * i + 1),
          voc.getLong(i))
      }.toDF("frac", "cut", "n_docs", "n_tokens", "vocab")
        .orderBy("frac")
    }),
    // Token counting two ways: whitespace + BPE-ish regex pieces.
    "t01_token_stats" -> ((s, d) =>
      docs(s, d).select(
        col("doc_id"),
        tokenCount(col("text")).as("n_ws"),
        regexTokenCount(col("text")).as("n_re"))
        .orderBy("doc_id")),

    // Pairwise Jensen–Shannon divergence between source token mixes:
    // the bounded symmetric drift number per source pair. Only common
    // tokens join (sort-merge on token); exclusive-token mass closes
    // via ½ln2·(2−Pc1−Pc2) with exact integer mass sums.
    "t24_jsd" -> ((s, d) => {
      val staged = docs(s, d)
        .select(col("source"), tokens(col("text")).as("ts"))
      val tk = staged.select(col("source"), explode(col("ts")).as("tok"))
      graft.ops.EvalOps.jsdPairs(tk, "source", col("tok"))
        .orderBy("g1", "g2")
    }),

    // TextRank keyword extraction (Mihalcea & Tarau 2004): PageRank
    // over the word co-occurrence graph (adjacent-token pairs seen ≥3
    // times), top-50 by rank — the unsupervised "what is this corpus
    // about" keyword list. Adjacency via ONE keyed lead window over a
    // staged token explode (never a positional self-join); the graph
    // then rides d20's pageRank machinery (keyed joins, per-round
    // lineage cut). Ranks snap to the 1e-9 grid every round.
    "t23_textrank" -> ((s, d) => {
      val staged = docs(s, d)
        .select(col("doc_id"), tokens(col("text")).as("ts"))
      val toks = staged
        .select(col("doc_id"), posexplode(col("ts")))
        .toDF("doc_id", "pos", "tok")
      val w = Window.partitionBy("doc_id").orderBy("pos")
      val ap = toks.withColumn("nxt", lead(col("tok"), 1).over(w))
        .filter(col("nxt").isNotNull && col("tok") =!= col("nxt"))
        .select(least(col("tok"), col("nxt")).as("w1"),
          greatest(col("tok"), col("nxt")).as("w2"))
      val edges = ap.groupBy("w1", "w2")
        .agg(count(lit(1)).as("c"))
        .filter(col("c") >= 3).select("w1", "w2")
      graft.ops.GraphOps.pageRank(edges, "w1", "w2", iters = 5)
        .orderBy(col("rank").desc, col("id").asc).limit(50)
        .withColumnRenamed("id", "token")
    }),

    // Reliability/calibration bins: does the composite quality score
    // track the long-document label it encodes? 10 equal-width bins,
    // positive rate + mean score per bin (exact-integer ratios and
    // µ-unit floor sums — the reliability diagram a scorer audit plots).
    "t21_calibration" -> ((s, d) =>
      graft.ops.EvalOps.calibration(docs(s, d),
          col("n_chars") > 500, qualityScore(col("text")), bins = 10)
        .orderBy("bin")),

    // Quality scoring: length, stopword ratio, mean token length, composite.
    "t02_quality" -> ((s, d) =>
      docs(s, d).select(
        col("doc_id"),
        length(col("text")).as("n_chars"),
        tokenCount(col("text")).as("n_tokens"),
        round6(stopwordRatio(col("text"))).as("stop_ratio"),
        round6(meanTokenLength(col("text"))).as("mean_tok_len"),
        qualityScore(col("text")).as("quality"))
        .orderBy("doc_id")),

    // RAG-style sliding-window token chunking: 32-token chunks with an
    // 8-token overlap (stride 24). The token array stages in a Project
    // before the Generate; chunk ids explode from a sequence derived off
    // the staged array — zero shuffles, per-partition fan-out only.
    "t10_chunk_tokens" -> ((s, d) =>
      graft.ops.TextOps.chunkTokens(docs(s, d), "doc_id", "text", 32, 8)
        .orderBy("doc_id", "chunk_id")),

    // Character-diversity quality signal: compiled byte-entropy expression
    // (graft_entropy) — one 256-counter pass per row inside codegen, vs
    // the per-doc explode+groupBy histogram the oracle spells.
    "t11_entropy" -> ((s, d) =>
      docs(s, d).select(col("doc_id"),
          graft.ops.TextOps.round6(
            graft.functions.ByteEntropy.entropy(col("text"))).as("ent"))
        .orderBy("doc_id")),

    // Global document frequency: top-20 terms by #docs containing them.
    // explode(distinct terms) → groupBy term: partial counts combine
    // map-side; the shuffle carries one row per (term, partition).
    "t03_term_docfreq" -> ((s, d) =>
      docs(s, d)
        .select(col("doc_id"), explode(termSet(col("text"))).as("term"))
        .groupBy("term").agg(count(lit(1)).as("df"))
        .orderBy(col("df").desc, col("term").asc)
        .limit(20)),

    // tf-idf: top-3 terms per document. Two aggregations (per-doc tf, global
    // df) + a window top-k. Both factors derive from exact integer counts so
    // the doubles agree bit-for-bit across engines.
    "t04_tfidf" -> ((s, d) => {
      val dd = docs(s, d)
      val n = dd.count() // corpus size: scalar, computed once
      // two consumers (tf and df branches) — persist to tokenize once. The
      // result is lazy, so the cache must outlive this builder; it is
      // released by graft.Caches.clear() (the mains call it per query).
      val toks = graft.Caches.track(
        dd.select(col("doc_id"), explode(tokens(col("text"))).as("term"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        .withColumn("ntok", sum(col("tf")).over(Window.partitionBy("doc_id")))
      val df_ = toks.select("doc_id", "term").distinct()
        .groupBy("term").agg(count(lit(1)).as("df"))
      val scored = tf.join(df_, "term")
        .withColumn("tfidf",
          (col("tf").cast("double") / col("ntok").cast("double"))
            * log(lit(n.toDouble) / col("df").cast("double")))
        .withColumn("rk", row_number().over(
          Window.partitionBy("doc_id")
            .orderBy(col("tfidf").desc, col("term").asc)))
        .filter(col("rk") <= 3)
      scored.select(col("doc_id"), col("rk"), col("term"),
        round(col("tfidf"), 6).as("tfidf"))
        .orderBy("doc_id", "rk")
    }),

    // Language-ID: script-range stage + Latin marker-stopword fallback,
    // over the signal-SPLICED fixture (see spliceLang — raw fixture bytes
    // are ASCII English-ish, so without the splice only the en branch is
    // testable).
    "t05_langid" -> ((s, d) =>
      docs(s, d)
        .select(col("doc_id"), spliceLang(col("text")).as("text"))
        .select(col("doc_id"), langId(col("text")).as("pred_lang"))
        .orderBy("doc_id")),

    // Content fingerprint (md5 of normalized text) — the exact-dedup key.
    "t06_fingerprint" -> ((s, d) =>
      docs(s, d).select(col("doc_id"), fingerprint(col("text")).as("fp"))
        .orderBy("doc_id")),

    // Within-document repetition signals (the Gopher-style quality gates):
    // top2_frac = share of bigram occurrences taken by the most common
    // bigram (per-doc mode → explode + two keyed aggregations, shuffles
    // bounded by doc_id); dup3_frac = 1 − distinct/total trigrams (pure
    // per-row expression, no shuffle).
    "t07_repetition" -> ((s, d) => {
      val dd = docs(s, d)
      // bigram array staged in a Project BEFORE the explode (Generate
      // evaluates its generator input interpreted)
      val counts = dd
        .select(col("doc_id"), ngramsOfTokens(tokens(col("text")), 2).as("gs"))
        .select(col("doc_id"), explode(col("gs")).as("g"))
        .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
        .groupBy("doc_id").agg(max("c").as("mc"), sum("c").as("tot"))
      dd.select(col("doc_id"),
          dupNgramFraction(col("text"), 3).as("d3"))
        .join(counts, Seq("doc_id"), "left")
        .select(col("doc_id"),
          round6(coalesce(col("mc").cast("double") / col("tot").cast("double"),
            lit(0.0))).as("top2_frac"),
          round6(col("d3")).as("dup3_frac"))
        .orderBy("doc_id")
    }),

    // PII redaction: the fixture corpus carries no PII, so the gate splices
    // deterministic synthetic contact lines into every doc (same expression
    // on the DuckDB side) — the hash compare then verifies the Java and RE2
    // regex engines redact byte-identically, which is the portability claim.
    "t09_pii_redact" -> ((s, d) =>
      docs(s, d)
        .select(col("doc_id"),
          redactPii(concat(col("text"),
            lit(" contact user"), col("doc_id").cast("string"),
            lit("@mail.example.org or +1 (555) 010-"),
            col("doc_id").cast("string"),
            lit(" from 10.0.0."), col("doc_id").cast("string")))
            .as("redacted"))
        .orderBy("doc_id")),

    // CCNet-style LM quality score: corpus-trained add-0.5 bigram LM,
    // per-doc mean token log-prob. The LM lives as DataFrames (bigram +
    // context count tables keyed by their n-gram) — scoring is two keyed
    // joins + one partial+final avg; the only driver scalar is |V|.
    "t08_lm_score" -> ((s, d) =>
      lmScore(docs(s, d), "doc_id", "text", addK = 0.5)
        .withColumn("avg_logp", round(col("avg_logp"), 6))
        .orderBy("doc_id")),

    // BPE tokenizer-training statistics: top-20 adjacent character pairs
    // weighted by corpus word frequency — the first merge candidates;
    // pair walk runs on the DISTINCT vocabulary only.
    "t12_bpe_pairs" -> ((s, d) =>
      bpePairStats(docs(s, d), "text", topK = 20)),

    // TRUE BPE TRAINING (Sennrich 2016) — t12's pair statistics made
    // the actual loop: 8 greedy merge rounds over the character-split
    // corpus vocabulary, each an arg-max of frequency-weighted adjacent
    // pair counts (ties → lexicographically smallest) applied
    // everywhere via the engine-portable '|'-wrapped replace. Output =
    // the merge table a tokenizer ships; the oracle replays the
    // identical rounds.
    "t30_bpe_train" -> ((s, d) =>
      graft.ops.TextOps.bpeTrain(docs(s, d), "text", merges = 8)
        .orderBy("round")),

    // BPE APPLY — the trained tokenizer's vocabulary-coverage view:
    // segment the corpus with the 8 learned merges (the loop's final
    // state IS the segmentation) and rank the top-20 subword units by
    // frequency-weighted count. Train → apply, one lazy story; the
    // oracle replays the identical rounds and aggregates the final
    // state.
    "t31_bpe_segment" -> ((s, d) =>
      graft.ops.TextOps.bpeSegment(docs(s, d), "text", merges = 8,
        topK = 20)),

    // UNIGRAM-LM TOKENIZER TRAINING (Kudo 2018 / SentencePiece's other
    // half — BPE's production sibling): seed = all ≤4-char substrings
    // of the corpus vocabulary (chars + top-30 multi), then 3 hard-EM
    // rounds — Viterbi max-product segmentation of every word, usage
    // recount, zero-usage pruning, Laplace re-estimation. Products,
    // comparisons and exact integer divisions ONLY (no log/exp), so the
    // whole loop replays bit-identically as a DuckDB recursive-CTE DP.
    // Output = the per-round EM usage trace.
    "t34_unigram_train" -> ((s, d) =>
      graft.ops.TextOps.unigramTrain(docs(s, d), "text", maxPiece = 4,
          seedVocab = 30, rounds = 3)
        .orderBy(col("round"), col("cnt").desc, col("piece"))),

    // UNIGRAM-LM APPLY — tokenizer inference: every document segments
    // into the trained subword pieces (per-token Viterbi via ONE join
    // from the doc tokens to the |vocab|-sized word→segmentation
    // table), reassembled in token order and fingerprinted. The
    // train→apply story t30/t31 tells for BPE, told for unigram.
    "t35_unigram_apply" -> ((s, d) =>
      graft.ops.TextOps.unigramSegment(docs(s, d), "doc_id", "text",
          maxPiece = 4, seedVocab = 30, rounds = 3)
        .select(col("doc_id"), col("n_tokens"), col("n_pieces"),
          md5(encode(col("seg"), "UTF-8")).as("seg_fp"))
        .orderBy("doc_id")),

    // QUALITY-CLASSIFIER TRAINING in-engine — the fastText-shaped
    // filter a mixture pipeline DISTILLS its heuristics into (run the
    // expensive rule once, serve the cheap classifier everywhere):
    // hashed token counts (16 buckets + bias) → full-batch logistic
    // regression, 5 fixed iterations, weak label = t02's quality
    // heuristic >= 0.5 (grid-snapped on both engines, so the label
    // itself is portable). Rational sigmoid + dyadic-grid residual
    // snapping make every distributed sum EXACT, so the weight trace
    // hash-matches the DuckDB unrolled replay with no output rounding.
    "t36_quality_clf_train" -> ((s, d) =>
      graft.ops.TextOps.textClassifierTrain(docs(s, d), "doc_id", "text",
          when(graft.ops.TextOps.qualityScore(col("text")) >= 0.5, 1L)
            .otherwise(0L),
          dim = 16, iters = 8, memoKey = Some(s"docs-quality:$d"))
        .orderBy("iter", "feat")),

    // QUALITY-CLASSIFIER SCORING — the trained filter applied back over
    // the corpus: exact margins under the final snapped weights,
    // rational-sigmoid scores, 0.5-threshold routing decision. The
    // inference shape is one codegen'd scan + one keyed sum per doc.
    "t37_quality_clf_score" -> ((s, d) =>
      graft.ops.TextOps.textClassifierScore(docs(s, d), "doc_id", "text",
          when(graft.ops.TextOps.qualityScore(col("text")) >= 0.5, 1L)
            .otherwise(0L),
          dim = 16, iters = 8, memoKey = Some(s"docs-quality:$d"))
        .orderBy("doc_id")),

    // TOKENIZER DATASHEET — BPE vs unigram-LM trained on the SAME
    // corpus (the decision table a mixture pipeline reads before
    // committing a vocab): distinct subword units actually used,
    // frequency-weighted piece totals, chars/piece compression. The
    // oracle replays BOTH training loops in one statement (each in its
    // own nested WITH — the CTE name families collide otherwise).
    "t38_tokenizer_compare" -> ((s, d) =>
      graft.ops.TextOps.tokenizerCompare(docs(s, d), "text", merges = 8,
          maxPiece = 4, seedVocab = 30, rounds = 3)
        .orderBy("tokenizer")),

    // STREAMING CLASSIFIER SCORING — the serving half of t36/t37: the
    // corpus replays in three mod-3 micro-batches, each scored with the
    // FROZEN memo-shared model (textClassifierScoreWith rebuilds the
    // per-doc feature map for the batch alone); scores are per-doc
    // independent, so the accumulated stream must equal batch t37 —
    // t37's oracle VERBATIM (the e57 rule).
    "t44_clf_score_stream" -> ((s, d) => {
      implicit val sqlCtx = s.sqlContext
      import s.implicits._
      val label = when(
        graft.ops.TextOps.qualityScore(col("text")) >= 0.5, 1L)
        .otherwise(0L)
      val w = graft.ops.TextOps.textClassifierFit(docs(s, d), "doc_id",
        "text", label, dim = 16, iters = 8,
        memoKey = Some(s"docs-quality:$d"))
      val rows = graft.Caches.memo(s"replay:docall:$d") {
        Tables.documents(s, d).select("doc_id", "text")
          .collect() // replay fixture — |documents| rows, memoized
          .map(r => (r.getLong(0), r.getString(1))).toVector
      }
      val input = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, String)]
      var acc: DataFrame = null
      val q = input.toDF().toDF("doc_id", "text").writeStream
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
           _: Long) =>
            val scored = graft.ops.TextOps.textClassifierScoreWith(
                b.toDF(), "doc_id", "text", label, w, dim = 16)
              .localCheckpoint(true)
            acc = (if (acc == null) scored
                   else acc.unionByName(scored)).localCheckpoint(true)
            ()
        }
        .start()
      try {
        (0L to 2L).foreach { wv =>
          input.addData(rows.filter(_._1 % 3 == wv): _*)
          q.processAllAvailable()
        }
      } finally q.stop()
      acc.orderBy("doc_id")
    }),

    // IN-ENGINE WORD2VEC (SGNS) TRAINING — the t36 "train the model
    // inside the engine" story extended to EMBEDDINGS: vocab-trimmed
    // window pairs + expected negatives (negK·n_c·q, q ∝ f^0.75 — the
    // deterministic expectation of the sampled loss), full-batch GD
    // with md5-seeded grid-snapped embeddings, rational sigmoid,
    // per-term dyadic snaps. The trained matrices themselves
    // hash-match the DuckDB unrolled replay with NO output rounding.
    "t42_sgns_train" -> ((s, d) =>
      graft.ops.TextOps.sgnsTrain(docs(s, d), "doc_id", "text",
          window = 3, minCount = 2, dim = 4, negK = 2.0, eta = 0.5,
          iters = 3, memoKey = Some(s"docs:$d"))
        .orderBy("role", "w", "j")),

    // SAMPLED-NEGATIVE SGNS TRAINING — the production word2vec recipe
    // (k DRAWN negatives per positive instead of t42's expectation):
    // per center floor(negK·n_c) md5-uniform draws against the
    // grid-snapped cumulative of q ∝ f^0.75, routed through a bucketed
    // broadcast hash join — corpus-sized negative volume, never
    // vocab². Same exact-numerics GD loop; the trained matrices
    // hash-match the unrolled DuckDB replay (draws included) with NO
    // output rounding.
    "t45_sgns_sampled" -> ((s, d) =>
      graft.ops.TextOps.sgnsTrain(docs(s, d), "doc_id", "text",
          window = 3, minCount = 2, dim = 4, negK = 2.0, eta = 0.5,
          iters = 3, memoKey = Some(s"docs:$d"), sampled = true)
        .orderBy("role", "w", "j")),

    // SGNS NEIGHBOR PROBE — the trained space is a usable similarity
    // space: per vocabulary word the top-3 others by cosine of the
    // trained "in" vectors (training memo-shared with t42; the model
    // ships back as a literal matrix, so the all-words comparison is
    // one explode — no equality-free join).
    "t43_sgns_neighbors" -> ((s, d) =>
      graft.ops.TextOps.sgnsNeighbors(docs(s, d), "doc_id", "text",
          window = 3, minCount = 2, dim = 4, negK = 2.0, eta = 0.5,
          iters = 3, topK = 3, memoKey = Some(s"docs:$d"))
        .orderBy("w", "rk")),

    // NEGATIVE-SAMPLING noise table — skip-gram's other half: the
    // unigram^0.75 distribution negatives draw from, with f^0.75 built
    // as sqrt(f*sqrt(f)) (correctly-rounded ops only — pow is not),
    // dyadic-snapped terms, exact Σ, 6dp shares.
    "t41_negative_sampling" -> ((s, d) =>
      graft.ops.TextOps.negativeSampling(docs(s, d), "text")
        .orderBy("w")),

    // SKIP-GRAM TRAINING PAIRS — word2vec's data-prep pass: vocab-trim,
    // Mikolov frequency subsampling (md5-uniform draw vs the exact
    // keep-probability — engine-portable by the d05 discipline), doc
    // compaction, window-3 pair emission, (center, context) counts.
    "t40_skipgram_pairs" -> ((s, d) =>
      graft.ops.TextOps.skipgramPairs(docs(s, d), "doc_id", "text",
          window = 3, minCount = 2, subsampleT = Some(1e-3))
        .orderBy("center", "context")),

    // CLASSIFIER FEATURE DATASHEET — unigram vs unigram+bigram hashed
    // features (the actual fastText recipe: bag-of-words PLUS hashed
    // bigrams), both trained with the same exact-numerics GD on t36's
    // text-derived weak label, closed by per-variant accuracy from
    // exact (correct, n) integers. The oracle replays BOTH trainings in
    // one statement, each inside its own nested WITH (the t38 rule —
    // the clf CTE name families collide otherwise).
    "t39_clf_feature_compare" -> ((s, d) =>
      graft.ops.TextOps.textClassifierCompare(docs(s, d), "doc_id", "text",
          when(graft.ops.TextOps.qualityScore(col("text")) >= 0.5, 1L)
            .otherwise(0L),
          dim = 16, iters = 8, memoKey = Some(s"docs-quality:$d"))
        .orderBy("features")),

    // Misra-Gries heavy hitters over `source` through the native
    // mergeable aggregate (fixed k-counter state per partial — shuffle
    // payload never grows with cardinality). k=64 exceeds the domain, so
    // no counter ever evicts and the sketch is EXACT here: the gate
    // hash-matches a plain GROUP BY; OpsSpec asserts the eviction-regime
    // bounds on skewed synthetic data.
    "t15_freq_items" -> ((s, d) =>
      docs(s, d)
        .agg(graft.functions.FreqItems.freqItems(col("source"), 64)
          .as("hh"))
        .select(explode(col("hh")).as("h"))
        .select(col("h.item").as("item"), col("h.cnt").as("cnt"))
        .orderBy(col("cnt").desc, col("item"))),

    // BM25 retrieval scoring of the whole corpus against one bag-of-
    // words query: tokenize once, filter to query terms BEFORE any
    // exchange, tf/df keyed aggregates + one per-doc closing sum.
    "t17_bm25" -> ((s, d) =>
      bm25(docs(s, d), "doc_id", "text",
          Seq("broadcast", "join", "skew"))
        .select(col("doc_id"), round6(col("score")).as("score"))
        .orderBy("doc_id")),

    // Lexical diversity: per-doc type-token ratio + hapax fraction —
    // explode → (doc, term) count (no exchange after the doc spread) →
    // per-doc closing agg; exact integer divisions, no rounding grid.
    "t18_lexical" -> ((s, d) =>
      lexicalDiversity(docs(s, d), "doc_id", "text")
        .orderBy("doc_id")),

    // Flesch Reading Ease + Kincaid grade via the vowel-group syllable
    // heuristic; synthetic ⌊words/15⌋ sentence segmentation (fixture
    // text has no punctuation). Exact integer counts, two literal
    // expressions on the 6dp grid.
    "t22_readability" -> ((s, d) =>
      graft.ops.TextOps.readability(docs(s, d), "doc_id", "text")
        .orderBy("doc_id")),

    // Gopher quality rules: word/mean-length bounds, symbol ratio,
    // alphabetic fraction, stop-word floor. The fixture text carries no
    // symbols, so every 7th doc SPLICES a symbol tail (" ... # # #") —
    // identically on both engine sides, the t09/t13 convention — to
    // exercise the symbol-ratio rule. Pure staged projections, one scan.
    // Quality-gate FUNNEL over the t16 Gopher rules: per rule, how many
    // docs pass it alone and how many survive the cumulative AND in
    // rule order — the which-rule-kills-my-corpus introspection every
    // filter pipeline reports. ONE aggregation over the rule frame,
    // exploded to the 5-stage report.
    "t26_filter_funnel" -> ((s, d) => {
      val base = docs(s, d).select(col("doc_id"),
        when(pmod(col("doc_id"), lit(7)) === 0,
            concat(col("text"), lit(" ... # # #")))
          .otherwise(col("text")).as("tx"))
      val staged = base.select(col("doc_id"), col("tx"),
        tokens(col("tx")).as("ts"))
      val g = gopherRules(staged, "doc_id", "tx", "ts")
      def i(c: org.apache.spark.sql.Column) = when(c, 1L).otherwise(0L)
      val cum2 = col("ok_words") && col("ok_wlen")
      val cum3 = cum2 && col("ok_sym")
      val cum4 = cum3 && col("ok_alpha")
      val cum5 = cum4 && col("ok_stops")
      val agg = g.agg(count(lit(1)).as("n_total"),
        sum(i(col("ok_words"))).as("p1"), sum(i(col("ok_wlen"))).as("p2"),
        sum(i(col("ok_sym"))).as("p3"), sum(i(col("ok_alpha"))).as("p4"),
        sum(i(col("ok_stops"))).as("p5"),
        sum(i(cum2)).as("c2"), sum(i(cum3)).as("c3"),
        sum(i(cum4)).as("c4"), sum(i(cum5)).as("c5"))
      val stages = array(
        struct(lit("1_words").as("stage"), col("p1").as("n_pass"),
          col("p1").as("n_cum")),
        struct(lit("2_wlen").as("stage"), col("p2").as("n_pass"),
          col("c2").as("n_cum")),
        struct(lit("3_sym").as("stage"), col("p3").as("n_pass"),
          col("c3").as("n_cum")),
        struct(lit("4_alpha").as("stage"), col("p4").as("n_pass"),
          col("c4").as("n_cum")),
        struct(lit("5_stops").as("stage"), col("p5").as("n_pass"),
          col("c5").as("n_cum")))
      agg.select(col("n_total"), explode(stages).as("x"))
        .select(col("x.stage").as("stage"), col("n_total"),
          col("x.n_pass").as("n_pass"), col("x.n_cum").as("n_cum"),
          graft.ops.TextOps.round6(col("x.n_cum").cast("double")
            / col("n_total").cast("double")).as("cum_rate6"))
        .orderBy("stage")
    }),

    "t16_gopher" -> ((s, d) => {
      val base = docs(s, d).select(col("doc_id"),
        when(pmod(col("doc_id"), lit(7)) === 0,
            concat(col("text"), lit(" ... # # #")))
          .otherwise(col("text")).as("tx"))
      val staged = base.select(col("doc_id"), col("tx"),
        tokens(col("tx")).as("ts"))
      gopherRules(staged, "doc_id", "tx", "ts").orderBy("doc_id")
    }),

    // Unicode NFC canonicalization through the codegen'd graft_normalize
    // expression. The fixture is ASCII (already normal — the fast path),
    // so the gate SPLICES decomposed text onto every doc (e + combining
    // acute, a + combining ring) exactly like t09 splices PII: the
    // composed result must byte-match DuckDB's nfc_normalize.
    "t13_normalize" -> ((s, d) => {
      // splice: decomposed combining marks (NFC must compose) + BEL and
      // DEL control bytes (stripControl must drop)
      val spliced = concat(col("text"),
        lit(" cafe\u0301 a\u030Abc\u0007\u007F"))
      docs(s, d).select(
          col("doc_id"),
          stripControl(normalizeText(spliced, "NFC")).as("norm"))
        .select(col("doc_id"), length(col("norm")).as("n_chars"),
          md5(col("norm")).as("fp"))
        .orderBy("doc_id")
    }),

    // Sentence segmentation fan-out: split on sentence-final punctuation
    // runs (engine-portable, no lookbehind), per-sentence token counts.
    // The fixture text carries no punctuation, so the gate SPLICES a
    // punctuated tail (., !, ?, an ellipsis run, and a trailing period
    // that must NOT yield an empty sentence) — the t09/t13 pattern.
    "t14_sentences" -> ((s, d) =>
      docs(s, d)
        .select(col("doc_id"), graft.ops.TextOps.sentences(
            concat(col("text"),
              lit(". first tail! second tail?? third... end.")))
          .as("__ss"))
        .select(col("doc_id"), posexplode(col("__ss")))
        .toDF("doc_id", "sent_id", "sentence")
        .select(col("doc_id"), col("sent_id"), col("sentence"),
          tokenCount(col("sentence")).as("n_tokens"))
        .orderBy("doc_id", "sent_id")),

    // Bigram PMI collocations (phrase mining): one persisted tokenize
    // pass serves the bigram AND unigram counts; vocabulary-sized joins;
    // TakeOrderedAndProject top-k on the ROUNDED pmi.
    "t19_pmi" -> ((s, d) =>
      graft.ops.TextOps.pmiBigrams(docs(s, d), "text",
        minCount = 5, topK = 30)),

    // Zipf rank-frequency + fitted log-log slope: distributed rank
    // (range-bucket cumsum + freq-keyed tiebreak), exact 1e-6-unit
    // integer regression sums, slope closed by a 1-row probe.
    "t20_zipf" -> ((s, d) =>
      graft.ops.TextOps.zipfFit(docs(s, d), "text", minCount = 5)
        .orderBy("rank")),

    // Language-ID acceptance: the e49 classification report run over
    // t05's two-stage detector vs the fixture's lang labels — per-class
    // precision/recall/F1 + accuracy + kappa in exact BIGINT divisions.
    // Runs over the signal-SPLICED text (spliceLang): round 12 measured
    // zh recall 0 and the es/de/fr branches never fired on fixture bytes;
    // with per-class signals spliced in, every class must hit recall 1.
    "t28_langid_eval" -> ((s, d) =>
      graft.ops.EvalOps.classificationReport(
          docs(s, d).select(col("lang"), spliceLang(col("text")).as("text")),
          col("lang"), graft.ops.TextOps.langId(col("text")))
        .orderBy("label")),

    // Script-range language-ID acceptance over a 14-row multilingual
    // probe frame (the fixture never exercises ja/ko/ru/ar/el/he/hi/th):
    // every script class must classify by code-point range, the four
    // Latin classes by stopword markers, and the below-threshold mixed
    // row (one Han char in an English sentence) must FALL BACK to the
    // Latin stage — the 5 % dominance rule working as specified.
    "t32_script_langid" -> ((s, d) => {
      import s.implicits._
      scriptSamples.toDF("sid", "want", "text")
        .select(col("sid"), col("want"),
          langId(col("text")).as("pred_lang"))
        .orderBy("sid")
    }),

    // Routing-grade language-ID: a doc NO script claims and NO Latin
    // marker occurs in gets 'und' (undetermined) instead of
    // tie-defaulting to en — the quarantine class a mixture pipeline
    // routes to a heavier detector (an en-defaulted zero-signal doc
    // silently pollutes the English mixture weight). RAW fixture text,
    // no splice: 118 of the 500 sf0.01 docs carry zero marker signal,
    // and that honest share is exactly what this gate pins.
    "t33_langid_route" -> ((s, d) =>
      docs(s, d).select(col("doc_id"),
          graft.ops.TextOps.langIdRouted(col("text")).as("pred_lang"))
        .orderBy("doc_id")),

    // Top-TRIGRAM coverage: how much of each doc one repeated trigram
    // claims — the longest-gram half of the Gopher repetition family
    // (t07 has the top-2-gram share and the distinct-3-gram fraction;
    // a dominant REPEATED trigram is the looping-boilerplate signature
    // neither catches). Two doc-keyed aggregates over a staged explode.
    "t27_top_ngram" -> ((s, d) =>
      graft.ops.TextOps.topNgramShare(docs(s, d), "doc_id", "text", n = 3)
        .orderBy("doc_id"))
  )

  // DuckDB equivalents. Tokenization mirrored as
  // list_filter(string_split(lower(text), ' '), t -> t <> '').
  private val Toks = "list_filter(string_split(lower(text), ' '), t -> t <> '')"

  /** DuckDB mirror of the per-class signal splice (see spliceLang). */
  private val SpliceLangSql = {
    val m = s"CAST(floor(len($Toks)/4)+1 AS INT)"
    s"CASE WHEN lang = 'zh' THEN repeat('$ZhChar', " +
      "CAST(floor(length(text)/15)+1 AS INT)) || ' ' || text " +
      s"WHEN lang = 'es' THEN repeat('el la los de que ', $m) || text " +
      s"WHEN lang = 'de' THEN repeat('der die und das ist ', $m) || text " +
      s"WHEN lang = 'fr' THEN repeat('le les et est une ', $m) || text " +
      "ELSE text END"
  }

  /** DuckDB mirror of [[graft.ops.TextOps.langId]]'s script stage over
    * `textExpr`: RE2 `\\x{...}` range counts (same code points the JVM
    * regex sees), the same count>0 AND count*20 >= length dominance
    * rule, same class order (kana before Han), guarded by the same
    * any-non-Latin-1 probe; NULL when no script claims the row. */
  private[queries] def scriptCaseSql(textExpr: String): String = {
    val ranges = Seq(
      ("ja", 0x3040, 0x30FF), ("zh", 0x4E00, 0x9FFF),
      ("ko", 0xAC00, 0xD7A3), ("ru", 0x0400, 0x04FF),
      ("ar", 0x0600, 0x06FF), ("el", 0x0370, 0x03FF),
      ("he", 0x0590, 0x05FF), ("hi", 0x0900, 0x097F),
      ("th", 0x0E00, 0x0E7F))
    val whens = ranges.map { case (l, lo, hi) =>
      val cnt = f"len(regexp_extract_all($textExpr, " +
        f"'[\\x{$lo%04X}-\\x{$hi%04X}]'))"
      s"WHEN $cnt > 0 AND $cnt * 20 >= length($textExpr) THEN '$l'"
    }.mkString(" ")
    s"CASE WHEN regexp_matches($textExpr, '[^\\x00-\\xff]') " +
      s"THEN CASE $whens END END"
  }

  /** DuckDB mirror of the Latin stopword fallback over marker counts
    * en/es/de/fr (columns must exist in the enclosing CTE). */
  private[queries] val LatinCaseSql =
    """CASE WHEN en >= es AND en >= de AND en >= fr THEN 'en'
       WHEN es >= de AND es >= fr THEN 'es'
       WHEN de >= fr THEN 'de' ELSE 'fr' END"""

  /** Marker-count column list shared by the langid oracles. */
  private[queries] val MarkerColsSql =
    """len(list_filter(ts, x -> x IN ('the','and','of','is'))) AS en,
       len(list_filter(ts, x -> x IN ('el','la','los','de','que'))) AS es,
       len(list_filter(ts, x -> x IN ('der','die','und','das','ist'))) AS de,
       len(list_filter(ts, x -> x IN ('le','les','et','est','une'))) AS fr"""


  /** t30 oracle: the BPE training rounds unrolled — identical wrapped
    * representation, identical greedy replace, identical (cnt DESC,
    * x ASC, y ASC) arg-max; every CTE MATERIALIZED (round r+1 re-reads
    * round r, the d31 lesson). */
  private def bpeSql(merges: Int): String = {
    val unions = (1 to merges).map { r =>
      s"""SELECT $r AS round, trim(x, '|') AS lhs, trim(y, '|') AS rhs,
           trim(x, '|') || trim(y, '|') AS merged, cnt FROM m$r"""
    }.mkString(" UNION ALL ")
    s"""WITH ${bpeCtes(merges)}
       SELECT * FROM ($unions) ORDER BY round"""
  }

  /** t31 oracle: the same training replay, closed by the final state's
    * frequency-weighted subword counts (top-`topK`). */
  private def bpeSegmentSql(merges: Int, topK: Int): String =
    s"""WITH ${bpeCtes(merges)}
       SELECT trim(u.t, '|') AS subword,
         CAST(sum(freq) AS BIGINT) AS cnt
       FROM (SELECT string_split(s, ' ') AS ts, freq FROM v$merges),
         LATERAL unnest(ts) AS u(t)
       GROUP BY 1 ORDER BY cnt DESC, subword ASC LIMIT $topK"""

  /** Shared v0 + unrolled merge-round CTE text for the BPE oracles. */
  private def bpeCtes(merges: Int): String = {
    val rounds = (1 to merges).map { r =>
      s"""p$r AS MATERIALIZED (
           SELECT ts[u.i] AS x, ts[u.i + 1] AS y,
             CAST(sum(freq) AS BIGINT) AS cnt
           FROM (SELECT string_split(s, ' ') AS ts, freq FROM v${r - 1}
                 WHERE len(string_split(s, ' ')) >= 2) t,
             LATERAL unnest(range(1, len(ts))) AS u(i)
           GROUP BY 1, 2),
         m$r AS MATERIALIZED (SELECT x, y, cnt FROM p$r
           ORDER BY cnt DESC, x ASC, y ASC LIMIT 1),
         v$r AS MATERIALIZED (
           SELECT replace(s, m.x || ' ' || m.y,
             '|' || trim(m.x, '|') || trim(m.y, '|') || '|') AS s, freq
           FROM v${r - 1}, m$r m)"""
    }.mkString(",\n")
    s"""v0 AS MATERIALIZED (
         SELECT array_to_string(list_transform(range(1, len(w) + 1),
             i -> '|' || substr(w, i, 1) || '|'), ' ') AS s,
           CAST(count(*) AS BIGINT) AS freq
         FROM (SELECT unnest(ts) AS w
               FROM (SELECT $Toks AS ts FROM documents))
         GROUP BY 1),
       $rounds"""
  }

  /** t34/t35 shared unigram-EM replay: seed substring counts, Laplace
    * vocab v0, then per EM round a recursive max-product Viterbi DP
    * (the prefix-score list grows per recursion step; vocab lookups are
    * LEFT JOINs — a correlated scalar subquery inside a recursion is
    * re-planned catastrophically by DuckDB), a recursive backpointer
    * walk into the piece list, a usage recount, and prune +
    * re-estimate. Every nonlinear step is products/compares/exact
    * integer division — bit-identical to the Spark fold. */
  private def unigramCtes(maxPiece: Int, seedVocab: Int,
                          rounds: Int): String = {
    def roundCtes(r: Int, vsrc: String): String = {
      val joins = (1 to maxPiece).map { l =>
        s"""LEFT JOIN $vsrc p$l ON i + 1 >= $l
           AND p$l.piece = substr(w, i + 2 - $l, $l)"""
      }.mkString("\n   ")
      val cands = (1 to maxPiece).map { l =>
        s"""CASE WHEN p$l.p IS NOT NULL THEN
           {'s': b[i + 2 - $l].s * p$l.p, 'bl': $l}
           ELSE {'s': CAST(-1.0 AS DOUBLE), 'bl': 0} END"""
      }.mkString(", ")
      s"""dp$r AS (
           SELECT w, freq, 0 AS i,
             [{'s': CAST(1.0 AS DOUBLE), 'bl': 0}] AS b FROM words
           UNION ALL
           SELECT w, freq, i + 1, list_append(b, list_max([$cands]))
           FROM dp$r
           $joins
           WHERE i < length(w)),
         wk$r AS (
           SELECT w, freq, length(w) AS i, CAST([] AS VARCHAR[]) AS ps, b
           FROM dp$r WHERE i = length(w)
           UNION ALL
           SELECT w, freq, i - b[i + 1].bl,
             list_prepend(substr(w, i - b[i + 1].bl + 1, b[i + 1].bl), ps),
             b
           FROM wk$r WHERE i > 0),
         cnt$r AS MATERIALIZED (
           SELECT u.pc AS piece, CAST(sum(freq) AS BIGINT) AS cnt
           FROM (SELECT freq, ps FROM wk$r WHERE i = 0),
             LATERAL unnest(ps) AS u(pc)
           GROUP BY 1),
         vo$r AS MATERIALIZED (
           SELECT vv.piece, COALESCE(c.cnt, 0) AS cnt FROM (
             SELECT piece FROM chars
             UNION
             SELECT v.piece FROM $vsrc v JOIN cnt$r c2
               ON c2.piece = v.piece AND c2.cnt >= 1) vv
           LEFT JOIN cnt$r c ON c.piece = vv.piece),
         tot$r AS MATERIALIZED (
           SELECT CAST(sum(cnt) AS BIGINT) AS t,
             CAST(count(*) AS BIGINT) AS n FROM vo$r),
         v$r AS MATERIALIZED (
           SELECT piece, (cnt + 1.0) / (t + n) AS p FROM vo$r, tot$r)"""
    }
    s"""words AS MATERIALIZED (
         SELECT u.t AS w, CAST(count(*) AS BIGINT) AS freq
         FROM documents, LATERAL unnest($Toks) AS u(t) GROUP BY 1),
       seeds AS MATERIALIZED (
         SELECT substr(w, CAST(i.i AS INTEGER), CAST(l.l AS INTEGER))
             AS piece,
           CAST(sum(freq) AS BIGINT) AS cnt
         FROM words,
           LATERAL unnest(range(1, length(w) + 1)) AS i(i),
           LATERAL unnest(range(1, $maxPiece + 1)) AS l(l)
         WHERE i.i + l.l - 1 <= length(w)
         GROUP BY 1),
       chars AS MATERIALIZED (
         SELECT piece FROM seeds WHERE length(piece) = 1),
       vo0 AS MATERIALIZED (
         SELECT s.piece, s.cnt FROM seeds s
         WHERE s.piece IN (
           SELECT piece FROM chars
           UNION
           SELECT piece FROM (
             SELECT piece FROM seeds WHERE length(piece) > 1
             ORDER BY cnt DESC, piece ASC LIMIT $seedVocab))),
       tot0 AS MATERIALIZED (
         SELECT CAST(sum(cnt) AS BIGINT) AS t,
           CAST(count(*) AS BIGINT) AS n FROM vo0),
       v0 AS MATERIALIZED (
         SELECT piece, (cnt + 1.0) / (t + n) AS p FROM vo0, tot0),
       ${(1 to rounds).map(r => roundCtes(r, s"v${r - 1}")).mkString(",\n       ")}"""
  }

  /** t36/t37 shared logistic-regression replay: hashed-count features,
    * `iters` unrolled GD iterations — margins as exact keyed sums,
    * rational sigmoid, dyadic-grid residual snap, Laplace-free update
    * with the identical `w + 4.0 * g / n` association (the learning
    * rate must match TextOps.textClfLoop's — tune both together). */
  private[queries] def clfCtes(dim: Int, iters: Int,
                               bigrams: Boolean = false): String = {
    val md5long = "CAST(concat('0x', substr(md5(t), 1, 15)) AS BIGINT)"
    val md5longB = "CAST(concat('0x', substr(md5(bt), 1, 15)) AS BIGINT)"
    def snap(e: String) = s"floor(($e) * 1048576.0 + 0.5) / 1048576.0"
    // t39's second feature block: hashed bigrams in buckets [dim, 2·dim),
    // normalized by the doc's bigram count (n−1); length/bias ids shift
    val nFeat = if (bigrams) 2 * dim else dim
    val bgrCte = if (!bigrams) "" else
      s"""bgr AS (SELECT doc_id, ts[u.i] || ' ' || ts[u.i+1] AS bt
           FROM t0, LATERAL unnest(range(1, len(ts))) AS u(i)),
       """
    val bgrArm = if (!bigrams) "" else
      s"""UNION ALL
         SELECT b2.doc_id, b2.feat,
           ${snap("CAST(c AS DOUBLE) / CAST(greatest(n - 1, 1) AS DOUBLE)")}
         FROM (SELECT doc_id, $dim + ($md5longB % $dim) AS feat,
                 CAST(count(*) AS BIGINT) AS c
               FROM bgr GROUP BY 1, 2) b2
         JOIN lens USING (doc_id)
         """
    val its = (1 to iters).map { i =>
      s"""z$i AS MATERIALIZED (
           SELECT doc_id, sum(x * w) AS z
           FROM feats JOIN w${i - 1} USING (feat) GROUP BY 1),
         r$i AS MATERIALIZED (
           SELECT l.doc_id,
             ${snap("CAST(y AS DOUBLE) - (0.5 + z / (2.0 * (1.0 + abs(z))))")}
               AS r
           FROM labels l JOIN z$i USING (doc_id)),
         g$i AS MATERIALIZED (
           SELECT feat, sum(${snap("r * x")}) AS g
           FROM feats JOIN r$i USING (doc_id) GROUP BY 1),
         w$i AS MATERIALIZED (
           SELECT p.feat,
             ${snap("p.w + 4.0 * COALESCE(g.g, 0.0) / n")} AS w
           FROM w${i - 1} p LEFT JOIN g$i g USING (feat), nn)"""
    }.mkString(",\n       ")
    s"""t0 AS (SELECT doc_id, text, $Toks AS ts FROM documents),
       lens AS MATERIALIZED (
         SELECT doc_id, CAST(len(ts) AS BIGINT) AS n FROM t0),
       toks AS (SELECT doc_id, u.t AS t FROM t0,
           LATERAL unnest(ts) AS u(t)),
       ${bgrCte}feats AS MATERIALIZED (
         SELECT b.doc_id, b.feat,
           ${snap("CAST(c AS DOUBLE) / CAST(greatest(n, 1) AS DOUBLE)")}
             AS x
         FROM (SELECT doc_id, $md5long % $dim AS feat,
                 CAST(count(*) AS BIGINT) AS c
               FROM toks GROUP BY 1, 2) b
         JOIN lens USING (doc_id)
         $bgrArm
         UNION ALL
         SELECT doc_id, CAST($nFeat AS BIGINT),
           ${snap("CAST(least(n, 512) AS DOUBLE) / 512.0")}
         FROM lens
         UNION ALL
         SELECT doc_id, CAST(${nFeat + 1} AS BIGINT), CAST(1.0 AS DOUBLE)
         FROM documents),
       labels AS MATERIALIZED (
         SELECT doc_id, CASE WHEN
             floor(least(length(text) / 500.0, 1.0) * greatest(0.0,
               1.0 - (CASE WHEN len(ts) = 0 THEN 0.0 ELSE
                 len(list_filter(ts, x -> x IN ('the','a','an','of','and',
                   'to','in','is','on','for','with'))) * 1.0 / len(ts)
                 END) * 2.0) * 1e6 + 0.5) / 1e6 >= 0.5
           THEN 1 ELSE 0 END AS y
         FROM t0),
       nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
       w0 AS (SELECT CAST(u.f AS BIGINT) AS feat,
           CAST(0.0 AS DOUBLE) AS w
         FROM unnest(range(0, ${nFeat + 2})) AS u(f)),
       $its"""
  }

  /** t42 oracle: the full SGNS optimization unrolled — vocab-trimmed
    * window pairs, the √-spelled f^0.75 noise weights, md5-seeded
    * grid-snapped embeddings, and per iteration the score join,
    * rational-sigmoid residual snap, per-(word, dim) gradient sums of
    * snapped terms, and the binary-exact-η update. Every round CTE
    * MATERIALIZED (the d31 rule). */
  private def sgnsCtes(window: Int, minCount: Long, dim: Int,
                       negK: Double, eta: Double, iters: Int,
                       sampled: Boolean = false): String = {
    def snap(e: String) = s"floor(($e) * 1048576.0 + 0.5) / 1048576.0"
    def sigS(s: String) = s"(0.5 + ($s) / (2.0 * (1.0 + abs($s))))"
    val its = (1 to iters).map { i =>
      s"""sg$i AS MATERIALIZED (
           SELECT ww.c, ww.x, ww.wgt, ww.sign,
             sum(uu.val * vv.val) AS s
           FROM ww
           JOIN eu${i - 1} uu ON uu.w = ww.c
           JOIN ev${i - 1} vv ON vv.w = ww.x AND vv.j = uu.j
           GROUP BY 1, 2, 3, 4),
         rr$i AS MATERIALIZED (
           SELECT c, x, ${snap(s"CASE WHEN sign = 1 THEN wgt * (1.0 - ${
             sigS("s")}) ELSE -wgt * ${sigS("s")} END")} AS r
           FROM sg$i),
         gu$i AS MATERIALIZED (
           SELECT r.c AS w, v.j, sum(${snap("r.r * v.val")}) AS g
           FROM rr$i r JOIN ev${i - 1} v ON v.w = r.x GROUP BY 1, 2),
         gv$i AS MATERIALIZED (
           SELECT r.x AS w, u.j, sum(${snap("r.r * u.val")}) AS g
           FROM rr$i r JOIN eu${i - 1} u ON u.w = r.c GROUP BY 1, 2),
         eu$i AS MATERIALIZED (
           SELECT p.w, p.j,
             ${snap(s"p.val + ($eta * COALESCE(g.g, 0.0)) / nwt.nw")} AS val
           FROM eu${i - 1} p LEFT JOIN gu$i g USING (w, j), nwt),
         ev$i AS MATERIALIZED (
           SELECT p.w, p.j,
             ${snap(s"p.val + ($eta * COALESCE(g.g, 0.0)) / nwt.nw")} AS val
           FROM ev${i - 1} p LEFT JOIN gv$i g USING (w, j), nwt)"""
    }.mkString(",\n")
    def init(side: String) = snap(
      s"(CAST(concat('0x', substr(md5('$side:' || w || ':' || j), 1, 15)) " +
        "AS BIGINT) / 576460752303423488.0 - 1.0) / 8.0")
    s"""t0 AS (SELECT doc_id, $Toks AS ts FROM documents),
       tok AS (SELECT doc_id, u.i - 1 AS pos, ts[u.i] AS w
         FROM t0, LATERAL unnest(range(1, len(ts) + 1)) AS u(i)),
       freq AS MATERIALIZED (SELECT w, CAST(count(*) AS BIGINT) AS f,
           floor(sqrt(f * sqrt(f)) * 1048576.0 + 0.5) / 1048576.0 AS t75
         FROM tok GROUP BY w),
       kept AS (SELECT tok.doc_id, tok.pos, tok.w
         FROM tok JOIN freq USING (w) WHERE f >= $minCount),
       comp AS (SELECT doc_id, w,
           row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS np
         FROM kept),
       prs AS MATERIALIZED (SELECT a.w AS c, b.w AS x,
           CAST(count(*) AS BIGINT) AS cnt
         FROM comp a JOIN comp b ON a.doc_id = b.doc_id
           AND a.np <> b.np AND abs(a.np - b.np) <= $window
         GROUP BY 1, 2),
       ncs AS MATERIALIZED (SELECT c, CAST(sum(cnt) AS BIGINT) AS n_c
         FROM prs GROUP BY 1),
       tz AS MATERIALIZED (SELECT sum(t75) AS tt FROM freq),
       ${if (!sampled)
        s"""ww AS MATERIALIZED (
         SELECT c, x, CAST(cnt AS DOUBLE) AS wgt, 1 AS sign FROM prs
         UNION ALL
         SELECT ncs.c, freq.w,
           ($negK * CAST(ncs.n_c AS DOUBLE)) * (freq.t75 / tz.tt), -1
         FROM ncs, freq, tz)"""
      else
        // t45: SAMPLED negatives — md5-uniform inverse-CDF against the
        // grid-snapped q (prefix sums of 2^-20 multiples are exact, so
        // the word-ordered window here builds the identical doubles the
        // Spark driver's sequential fold does); u = (h/2^60)*Σq, two
        // IEEE ops on identical inputs; last-interval closure catches a
        // u that rounds up to exactly Σq.
        s"""qq AS MATERIALIZED (SELECT w AS x,
           floor(t75 / tz.tt * 1048576.0 + 0.5) / 1048576.0 AS q
         FROM freq, tz),
       cdf AS MATERIALIZED (SELECT x, q,
           sum(q) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING
             AND CURRENT ROW) AS hi
         FROM qq),
       ct AS MATERIALIZED (SELECT max(hi) AS tot FROM cdf),
       drw AS MATERIALIZED (
         SELECT ncs.c,
           CAST(concat('0x', substr(md5('neg:' || ncs.c || ':' || u.i),
             1, 15)) AS BIGINT) AS h
         FROM ncs, LATERAL unnest(range(0,
           CAST(floor($negK * ncs.n_c) AS BIGINT))) AS u(i)),
       hit AS MATERIALIZED (
         SELECT drw.c, cdf.x
         FROM drw, ct, cdf
         WHERE drw.h / 1152921504606846976.0 * ct.tot >= cdf.hi - cdf.q
           AND (drw.h / 1152921504606846976.0 * ct.tot < cdf.hi
             OR cdf.hi = ct.tot)),
       ww AS MATERIALIZED (
         SELECT c, x, CAST(cnt AS DOUBLE) AS wgt, 1 AS sign FROM prs
         UNION ALL
         SELECT c, x, CAST(count(*) AS DOUBLE), -1
         FROM hit GROUP BY c, x)"""},
       nwt AS MATERIALIZED (
         SELECT CAST(sum(cnt) AS DOUBLE) AS nw FROM prs),
       jj AS (SELECT u.j AS j FROM unnest(range(0, $dim)) AS u(j)),
       eu0 AS MATERIALIZED (SELECT w, j, ${init("u")} AS val
         FROM freq, jj),
       ev0 AS MATERIALIZED (SELECT w, j, ${init("v")} AS val
         FROM freq, jj),
       $its"""
  }

  private def sgnsSql(window: Int, minCount: Long, dim: Int,
                      negK: Double, eta: Double, iters: Int,
                      sampled: Boolean = false): String =
    s"""WITH ${sgnsCtes(window, minCount, dim, negK, eta, iters, sampled)}
       SELECT role, w, CAST(j AS INTEGER) AS j, val FROM (
         SELECT 'in' AS role, w, j, val FROM eu$iters
         UNION ALL SELECT 'out', w, j, val FROM ev$iters)
       ORDER BY role, w, j"""

  /** t43 oracle: the trained "in" matrix reassembled to j-ordered
    * vectors, all-pairs cosine over the |vocab|-bounded frame, per-word
    * top-K by (cos DESC, neighbor ASC). */
  private def sgnsNeighborsSql(window: Int, minCount: Long, dim: Int,
                               negK: Double, eta: Double, iters: Int,
                               topK: Int): String =
    s"""WITH ${sgnsCtes(window, minCount, dim, negK, eta, iters)},
       uv AS (SELECT w, list(val ORDER BY j) AS e
         FROM eu$iters GROUP BY w),
       nn AS (SELECT a.w, b.w AS neighbor,
           list_dot_product(a.e, b.e)
             / (sqrt(list_dot_product(a.e, a.e))
               * sqrt(list_dot_product(b.e, b.e))) AS cos
         FROM uv a JOIN uv b ON a.w <> b.w)
       SELECT w,
         CAST(row_number() OVER (PARTITION BY w
           ORDER BY cos DESC, neighbor ASC) AS INTEGER) AS rk,
         floor(cos * 1e6 + 0.5) / 1e6 AS cos6, neighbor
       FROM nn QUALIFY rk <= $topK ORDER BY w, rk"""

  private def clfTrainSql(dim: Int, iters: Int): String = {
    val sel = (1 to iters)
      .map(i => s"SELECT $i AS iter, feat, w FROM w$i")
      .mkString(" UNION ALL ")
    s"""WITH ${clfCtes(dim, iters)}
       SELECT iter, feat, w FROM ($sel) ORDER BY iter, feat"""
  }

  /** t39 oracle: both feature variants' full GD replays in ONE
    * statement — each in its own nested WITH (CTE families collide) —
    * closed by the exact-integer accuracy division. */
  private def clfCompareSql(dim: Int, iters: Int): String = {
    def variant(name: String, bigrams: Boolean) =
      s"""SELECT '$name' AS features,
           CAST(correct AS BIGINT) AS correct, CAST(n AS BIGINT) AS n,
           floor(correct * 1.0 / n * 1e6 + 0.5) / 1e6 AS accuracy6
         FROM (
           WITH ${clfCtes(dim, iters, bigrams)},
           zf AS (SELECT doc_id, sum(x * w) AS z
             FROM feats JOIN w$iters USING (feat) GROUP BY 1)
           SELECT sum(CASE WHEN (z >= 0) = (y = 1) THEN 1 ELSE 0 END)
               AS correct,
             count(*) AS n
           FROM labels l JOIN zf USING (doc_id))"""
    s"""SELECT features, correct, n, accuracy6 FROM (
        ${variant("unigram", bigrams = false)}
        UNION ALL
        ${variant("unigram_bigram", bigrams = true)})
        ORDER BY features"""
  }

  private def clfScoreSql(dim: Int, iters: Int): String =
    s"""WITH ${clfCtes(dim, iters)},
       zf AS (SELECT doc_id, sum(x * w) AS z
         FROM feats JOIN w$iters USING (feat) GROUP BY 1)
       SELECT l.doc_id, CAST(y AS BIGINT) AS y,
         0.5 + z / (2.0 * (1.0 + abs(z))) AS score,
         CAST(CASE WHEN z >= 0 THEN 1 ELSE 0 END AS BIGINT) AS pred
       FROM labels l JOIN zf USING (doc_id)
       ORDER BY doc_id"""

  private def unigramTrainSql(maxPiece: Int, seedVocab: Int,
                              rounds: Int): String = {
    val sel = (1 to rounds)
      .map(r => s"SELECT $r AS \"round\", piece, cnt FROM cnt$r")
      .mkString(" UNION ALL ")
    s"""WITH RECURSIVE ${unigramCtes(maxPiece, seedVocab, rounds)}
       SELECT "round", piece, cnt FROM ($sel)
       ORDER BY "round", cnt DESC, piece ASC"""
  }

  private def unigramApplySql(maxPiece: Int, seedVocab: Int,
                              rounds: Int): String =
    s"""WITH RECURSIVE ${unigramCtes(maxPiece, seedVocab, rounds)},
       wseg AS MATERIALIZED (
         SELECT w, array_to_string(ps, ' ') AS seg,
           CAST(len(ps) AS BIGINT) AS np
         FROM wk$rounds WHERE i = 0),
       dtok AS (SELECT doc_id, u.i - 1 AS pos, ts[u.i] AS w
         FROM (SELECT doc_id, $Toks AS ts FROM documents) t,
           LATERAL unnest(range(1, len(ts) + 1)) AS u(i))
       SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(sum(np) AS BIGINT) AS n_pieces,
         md5(string_agg(seg, ' ' ORDER BY pos)) AS seg_fp
       FROM dtok JOIN wseg USING (w)
       GROUP BY doc_id ORDER BY doc_id"""

  /** t23 oracle: identical adjacency pairs via list indexing, then
    * d20's unrolled PageRank replay over the word graph (same 1e-9
    * per-round snap), top-50 by (rank desc, token asc). */
  private def textRankSql(iters: Int): String = {
    val head = s"""WITH t AS (SELECT doc_id, $Toks AS ts FROM documents),
       ap AS (SELECT
           least(ts[CAST(r.i AS INTEGER)], ts[CAST(r.i AS INTEGER) + 1])
             AS w1,
           greatest(ts[CAST(r.i AS INTEGER)],
             ts[CAST(r.i AS INTEGER) + 1]) AS w2
         FROM t, LATERAL unnest(range(1, len(ts))) AS r(i)
         WHERE ts[CAST(r.i AS INTEGER)] <> ts[CAST(r.i AS INTEGER) + 1]),
       pairs AS (SELECT w1 AS id1, w2 AS id2 FROM ap
         GROUP BY 1, 2 HAVING count(*) >= 3),
       edges AS (SELECT id1 AS a, id2 AS b FROM pairs
         UNION ALL SELECT id2, id1 FROM pairs),
       deg AS (SELECT a, count(*) AS deg FROM edges GROUP BY a),
       nn AS (SELECT count(*) AS n FROM deg),
       r0 AS (SELECT a AS id, 1.0 / (SELECT n FROM nn) AS r FROM deg)"""
    val its = (1 to iters).map { i =>
      s"""r$i AS (SELECT e.b AS id,
           floor(((1 - 0.85) / (SELECT n FROM nn)
             + 0.85 * sum(p.r / deg.deg)) * 1e9 + 0.5) / 1e9 AS r
         FROM edges e JOIN r${i - 1} p ON p.id = e.a
         JOIN deg ON deg.a = e.a
         GROUP BY e.b)"""
    }.mkString(",\n")
    s"""$head,
       $its
       SELECT id AS token, r AS rank FROM r$iters
       ORDER BY rank DESC, token ASC LIMIT 50"""
  }

  val oracles: Map[String, String] = Map(
    // t29: value-range cutoffs (CAST the DECIMAL fractions to DOUBLE;
    // floor widens to DOUBLE in DuckDB — CAST back), first-occurrence
    // vocabulary + token totals as correlated tier rollups.
    "t29_heaps_curve" ->
      s"""WITH b AS (SELECT min(doc_id) AS lo, max(doc_id) AS hi
             FROM documents),
         cuts AS (SELECT CAST(f AS DOUBLE) AS frac,
             CAST(lo + floor(CAST(f AS DOUBLE) * (hi - lo)) AS BIGINT)
               AS cut
           FROM b, (VALUES (0.1), (0.25), (0.5), (0.75), (1.0)) v(f)),
         tk AS (SELECT doc_id, unnest($Toks) AS t FROM documents),
         firsts AS (SELECT t, min(doc_id) AS fd FROM tk GROUP BY 1),
         tot AS (SELECT doc_id, len($Toks) AS nt FROM documents)
         SELECT frac, cut,
           (SELECT CAST(count(*) AS BIGINT) FROM documents
             WHERE doc_id <= cut) AS n_docs,
           (SELECT CAST(COALESCE(sum(nt), 0) AS BIGINT) FROM tot
             WHERE doc_id <= cut) AS n_tokens,
           (SELECT CAST(count(*) AS BIGINT) FROM firsts
             WHERE fd <= cut) AS vocab
         FROM cuts ORDER BY frac""",
    "t23_textrank" -> textRankSql(iters = 5),
    // t24: identical common-token join + 1e-9-unit term sums; the
    // exclusive-mass close uses the same pinned ln2 double literal.
    "t24_jsd" ->
      s"""WITH tk AS (SELECT source AS g, u.t AS tok FROM documents,
             LATERAL unnest($Toks) AS u(t)),
         cnt AS (SELECT g, tok, CAST(count(*) AS BIGINT) AS c
           FROM tk GROUP BY 1, 2),
         tot AS (SELECT g, CAST(sum(c) AS BIGINT) AS t
           FROM cnt GROUP BY 1),
         a AS (SELECT cnt.g, tok, c, t FROM cnt JOIN tot USING (g)),
         b AS (SELECT x.g AS g1, y.g AS g2, x.c AS c1, x.t AS t1,
             y.c AS c2, y.t AS t2,
             CAST(x.c AS DOUBLE) / CAST(x.t AS DOUBLE) AS p,
             CAST(y.c AS DOUBLE) / CAST(y.t AS DOUBLE) AS q
           FROM a x JOIN a y ON x.tok = y.tok AND x.g < y.g),
         s AS (SELECT g1, g2, CAST(count(*) AS BIGINT) AS n_common,
             CAST(sum(CAST(floor((p * ln(p / ((p + q) / 2))
               + q * ln(q / ((p + q) / 2))) * 1e9 + 0.5) AS BIGINT))
               AS BIGINT) AS su,
             CAST(sum(c1) AS BIGINT) AS sc1,
             CAST(max(t1) AS BIGINT) AS t1,
             CAST(sum(c2) AS BIGINT) AS sc2,
             CAST(max(t2) AS BIGINT) AS t2
           FROM b GROUP BY 1, 2)
         SELECT g1, g2, n_common,
           floor((0.5 * (CAST(su AS DOUBLE) / 1e9)
             + 0.5 * CAST(0.693147180559945 AS DOUBLE)
               * (2 - CAST(sc1 AS DOUBLE) / CAST(t1 AS DOUBLE)
                 - CAST(sc2 AS DOUBLE) / CAST(t2 AS DOUBLE)))
             * 1e6 + 0.5) / 1e6 AS jsd6
         FROM s ORDER BY g1, g2""",
    // t21: the t02 quality expression rebinned; bin doubles are bit-
    // identical on both sides (every input to the product is an exact-
    // integer-derived division in the same association), so even the
    // classic floor(0.7·10)=6 double artifact lands identically.
    "t21_calibration" ->
      s"""WITH t AS (SELECT n_chars, text, $Toks AS ts FROM documents),
         q AS (SELECT n_chars > 500 AS lab,
             floor(least(length(text) / 500.0, 1.0) * greatest(0.0,
               1.0 - (CASE WHEN len(ts) = 0 THEN 0.0 ELSE
                 len(list_filter(ts, x -> x IN ('the','a','an','of','and',
                   'to','in','is','on','for','with'))) * 1.0 / len(ts)
                 END) * 2.0)
               * 1e6 + 0.5) / 1e6 AS score
           FROM t),
         b AS (SELECT CAST(least(floor(score * 10), 9) AS INTEGER) AS bin,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN lab THEN 1 ELSE 0 END) AS BIGINT) AS pos,
             CAST(sum(CAST(floor(score * 1e6 + 0.5) AS BIGINT))
               AS BIGINT) AS su
           FROM q GROUP BY 1)
         SELECT bin, n, pos,
           floor(CAST(pos AS DOUBLE) / n * 1e6 + 0.5) / 1e6 AS rate6,
           floor(CAST(su AS DOUBLE) / 1e6 / n * 1e6 + 0.5) / 1e6
             AS mean_score6
         FROM b ORDER BY bin""",
    "t01_token_stats" ->
      s"""SELECT doc_id,
           CAST(len($Toks) AS INTEGER) AS n_ws,
           CAST(len(regexp_extract_all(lower(text),
             '[a-z0-9_]+|[^a-z0-9_\\s]')) AS INTEGER) AS n_re
         FROM documents ORDER BY doc_id""",
    "t02_quality" ->
      s"""WITH t AS (SELECT doc_id, text, $Toks AS ts FROM documents)
         SELECT doc_id,
           CAST(length(text) AS INTEGER) AS n_chars,
           CAST(len(ts) AS INTEGER) AS n_tokens,
           floor((CASE WHEN len(ts) = 0 THEN 0.0 ELSE
             len(list_filter(ts, x -> x IN ('the','a','an','of','and','to',
               'in','is','on','for','with'))) * 1.0 / len(ts) END) * 1e6
             + 0.5) / 1e6 AS stop_ratio,
           floor((CASE WHEN len(ts) = 0 THEN 0.0 ELSE
             list_sum(list_transform(ts, x -> length(x))) * 1.0 / len(ts)
             END) * 1e6 + 0.5) / 1e6 AS mean_tok_len,
           floor(least(length(text) / 500.0, 1.0) * greatest(0.0,
             1.0 - (CASE WHEN len(ts) = 0 THEN 0.0 ELSE
               len(list_filter(ts, x -> x IN ('the','a','an','of','and','to',
                 'in','is','on','for','with'))) * 1.0 / len(ts) END) * 2.0)
             * 1e6 + 0.5) / 1e6 AS quality
         FROM t ORDER BY doc_id""",
    "t10_chunk_tokens" ->
      s"""WITH t AS (SELECT doc_id, $Toks AS ws FROM documents),
         c AS (SELECT doc_id, ws, len(ws) AS n FROM t),
         s AS (SELECT doc_id, ws, n, u.i AS chunk_id,
             CAST(u.i * 24 + 1 AS INTEGER) AS st
           FROM c, LATERAL unnest(range(0, CASE WHEN n <= 32 THEN 1
             ELSE CAST(ceil((n - 32) / 24.0) AS BIGINT) + 1 END)) AS u(i))
         SELECT doc_id, chunk_id,
           array_to_string(ws[st:st + 31], ' ') AS chunk,
           least(32, n - chunk_id * 24) AS n_tokens
         FROM s ORDER BY doc_id, chunk_id""",
    // DuckDB's native entropy() aggregate over exploded characters ==
    // byte entropy on the all-ASCII fixtures; round6 absorbs the
    // association-order ulp between the two summations.
    "t11_entropy" ->
      """WITH ch AS (SELECT doc_id,
             unnest(string_split_regex(text, '')) AS c
           FROM documents)
         SELECT doc_id, floor(entropy(c) * 1e6 + 0.5) / 1e6 AS ent
         FROM ch GROUP BY doc_id ORDER BY doc_id""",
    "t03_term_docfreq" ->
      s"""SELECT term, count(*) AS df FROM (
           SELECT DISTINCT doc_id, unnest($Toks) AS term FROM documents)
         GROUP BY term ORDER BY df DESC, term ASC LIMIT 20""",
    "t04_tfidf" ->
      s"""WITH toks AS (
           SELECT doc_id, unnest($Toks) AS term FROM documents),
         tf AS (
           SELECT doc_id, term, count(*) AS tf,
             sum(count(*)) OVER (PARTITION BY doc_id) AS ntok
           FROM toks GROUP BY doc_id, term),
         df AS (
           SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY term),
         n AS (SELECT count(*) AS n FROM documents),
         scored AS (
           SELECT tf.doc_id, tf.term,
             (tf.tf * 1.0 / tf.ntok) * ln(n.n * 1.0 / df.df) AS tfidf
           FROM tf JOIN df USING (term) CROSS JOIN n)
         SELECT doc_id,
           CAST(row_number() OVER (PARTITION BY doc_id
             ORDER BY tfidf DESC, term ASC) AS INTEGER) AS rk,
           term, round(tfidf, 6) AS tfidf
         FROM scored QUALIFY rk <= 3 ORDER BY doc_id, rk""",
    "t05_langid" ->
      s"""WITH tx AS (SELECT doc_id, $SpliceLangSql AS text FROM documents),
         t AS (SELECT doc_id, ${scriptCaseSql("text")} AS script,
           $Toks AS ts FROM tx),
         sc AS (SELECT doc_id, script, $MarkerColsSql FROM t)
         SELECT doc_id, COALESCE(script, $LatinCaseSql) AS pred_lang
         FROM sc ORDER BY doc_id""",
    "t06_fingerprint" ->
      """SELECT doc_id, md5(regexp_replace(trim(lower(text)), ' +', ' ', 'g'))
           AS fp FROM documents ORDER BY doc_id""",
    "t07_repetition" ->
      s"""WITH toks AS (SELECT doc_id, $Toks AS ws FROM documents),
         bg AS (SELECT doc_id, ws[u.i] || ' ' || ws[u.i+1] AS g
                FROM toks, LATERAL unnest(range(1, len(ws))) AS u(i)),
         bgc AS (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY 1, 2),
         top AS (SELECT doc_id, max(c) AS mc, sum(c) AS tot FROM bgc GROUP BY 1),
         tg AS (SELECT doc_id,
                  ws[u.i] || ' ' || ws[u.i+1] || ' ' || ws[u.i+2] AS g
                FROM toks, LATERAL unnest(range(1, len(ws)-1)) AS u(i)),
         tgs AS (SELECT doc_id, count(*) AS n, count(DISTINCT g) AS nd
                 FROM tg GROUP BY 1)
         SELECT d.doc_id,
           floor(coalesce(t.mc * 1.0 / t.tot, 0.0) * 1e6 + 0.5) / 1e6
             AS top2_frac,
           floor(coalesce(1.0 - g.nd * 1.0 / g.n, 0.0) * 1e6 + 0.5) / 1e6
             AS dup3_frac
         FROM documents d
         LEFT JOIN top t USING (doc_id)
         LEFT JOIN tgs g USING (doc_id)
         ORDER BY doc_id""",
    "t09_pii_redact" ->
      """SELECT doc_id,
           regexp_replace(
             regexp_replace(
               regexp_replace(
                 text || ' contact user' || doc_id ||
                   '@mail.example.org or +1 (555) 010-' || doc_id ||
                   ' from 10.0.0.' || doc_id,
                 '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z][a-zA-Z]+',
                 '<EMAIL>', 'g'),
               '([0-9]{1,3}\.){3}[0-9]{1,3}', '<IP>', 'g'),
             '\+?[0-9][0-9()\[\] .-]{7,}[0-9]', '<PHONE>', 'g')
           AS redacted
         FROM documents ORDER BY doc_id""",
    "t08_lm_score" ->
      s"""WITH toks AS (SELECT doc_id, $Toks AS ws FROM documents),
         bg AS (SELECT doc_id, ws[u.i] AS w1, ws[u.i] || ' ' || ws[u.i+1] AS g
                FROM toks, LATERAL unnest(range(1, len(ws))) AS u(i)),
         bgc AS (SELECT g, count(*) AS cbg FROM bg GROUP BY 1),
         uni AS (SELECT t AS w1, count(*) AS cw FROM
                   (SELECT unnest(ws) AS t FROM toks) GROUP BY 1),
         v AS (SELECT count(*) AS v FROM uni),
         sc AS (SELECT bg.doc_id,
                  ln((bgc.cbg + 0.5) / (uni.cw + 0.5 * v.v)) AS lp
                FROM bg JOIN bgc USING (g) JOIN uni USING (w1) CROSS JOIN v),
         agg AS (SELECT doc_id, count(*) AS n_bg, avg(lp) AS alp
                 FROM sc GROUP BY 1)
         SELECT d.doc_id, coalesce(a.n_bg, 0) AS n_bg,
           round(a.alp, 6) AS avg_logp
         FROM documents d LEFT JOIN agg a USING (doc_id) ORDER BY doc_id""",
    // the compare hashes the row SET, so the (cnt desc, pair asc) LIMIT
    // tiebreak must be deterministic in both engines
    // t34/t35: the 3 unigram-EM rounds unrolled as recursive-CTE DPs —
    // identical seeds, Laplace estimates, max-product Viterbi (struct
    // list_max ties to the longer piece, matching Spark's greatest) and
    // recounts; t35 closes with the word→segmentation join over the
    // corpus tokens.
    "t34_unigram_train" ->
      unigramTrainSql(maxPiece = 4, seedVocab = 30, rounds = 3),
    "t35_unigram_apply" ->
      unigramApplySql(maxPiece = 4, seedVocab = 30, rounds = 3),
    // t36/t37: the identical five GD iterations unrolled; weights and
    // scores compare as RAW doubles — the dyadic-grid residual snap
    // makes every sum exact, so no output rounding is needed.
    "t36_quality_clf_train" -> clfTrainSql(dim = 16, iters = 8),
    "t37_quality_clf_score" -> clfScoreSql(dim = 16, iters = 8),
    // t44: the streamed accumulation answers the identical batch
    // question — t37's oracle re-registered VERBATIM (the e57 rule).
    "t44_clf_score_stream" -> clfScoreSql(dim = 16, iters = 8),
    // t39: unigram vs unigram+bigram feature ablation — both GD loops
    // replayed in one statement, nested WITH per variant.
    "t39_clf_feature_compare" -> clfCompareSql(dim = 16, iters = 8),
    // t42: the full SGNS optimization unrolled — trained embeddings
    // compare as raw grid doubles.
    // t45: the identical unrolled replay with the ww CTE swapped for
    // the sampled-negative construction (draws replayed in SQL).
    "t45_sgns_sampled" -> sgnsSql(window = 3, minCount = 2, dim = 4,
      negK = 2.0, eta = 0.5, iters = 3, sampled = true),
    "t42_sgns_train" -> sgnsSql(window = 3, minCount = 2, dim = 4,
      negK = 2.0, eta = 0.5, iters = 3),
    // t43: the same unrolled training, closed by the per-word cosine
    // top-3 over the trained "in" vectors.
    "t43_sgns_neighbors" -> sgnsNeighborsSql(window = 3, minCount = 2,
      dim = 4, negK = 2.0, eta = 0.5, iters = 3, topK = 3),
    // t41: the identical sqrt-spelled f^0.75 terms, dyadic snap, one
    // exact total, 6dp shares.
    "t41_negative_sampling" ->
      s"""WITH tok AS (SELECT u.t AS w FROM
           (SELECT $Toks AS ts FROM documents) t0,
           LATERAL unnest(ts) AS u(t)),
         freq AS (SELECT w, CAST(count(*) AS BIGINT) AS f,
             floor(sqrt(f * sqrt(f)) * 1048576.0 + 0.5) / 1048576.0
               AS t75
           FROM tok GROUP BY w),
         tot AS (SELECT sum(t75) AS s FROM freq)
         SELECT w, f, t75,
           floor(t75 / s * 1e6 + 0.5) / 1e6 AS share6
         FROM freq, tot ORDER BY w""",
    // t40: the identical md5-uniform draw vs the exact Mikolov keep
    // probability, compacted positions, window-3 pairs.
    "t40_skipgram_pairs" ->
      s"""WITH t0 AS (SELECT doc_id, $Toks AS ts FROM documents),
         tok AS (SELECT doc_id, u.i - 1 AS pos, ts[u.i] AS w
           FROM t0, LATERAL unnest(range(1, len(ts) + 1)) AS u(i)),
         freq AS (SELECT w, CAST(count(*) AS BIGINT) AS f
           FROM tok GROUP BY 1),
         tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM tok),
         kept AS (SELECT tok.doc_id, tok.pos, tok.w
           FROM tok JOIN freq USING (w), tot
           WHERE f >= 2 AND
             CAST(concat('0x', substr(md5(
                 tok.doc_id || ':' || tok.pos || ':' || tok.w), 1, 15))
               AS BIGINT) / 1152921504606846976.0
             < LEAST(1.0, (sqrt((f * 1.0 / n) / 0.001) + 1.0)
                 * (0.001 / (f * 1.0 / n)))),
         comp AS (SELECT doc_id, w,
             row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS np
           FROM kept),
         pairs AS (SELECT a.w AS center, b.w AS context
           FROM comp a JOIN comp b ON a.doc_id = b.doc_id
             AND a.np <> b.np AND abs(a.np - b.np) <= 3)
         SELECT center, context, CAST(count(*) AS BIGINT) AS cnt
         FROM pairs GROUP BY 1, 2 ORDER BY 1, 2""",
    // t38: both training loops replayed in ONE statement, each inside
    // its own nested WITH (bpe's v0..v8 and unigram's v0..v3 CTE name
    // families collide at the top level); the closing ratio divides two
    // exact integers.
    "t38_tokenizer_compare" ->
      s"""SELECT tokenizer, vocab_used, pieces_total, chars_per_piece
         FROM (
           SELECT 'bpe' AS tokenizer, vocab_used, pieces_total,
             chars_per_piece
           FROM (
             WITH ${bpeCtes(8)},
               st AS (SELECT string_split(s, ' ') AS ps, freq,
                   CAST(length(replace(replace(s, ' ', ''), '|', ''))
                     AS BIGINT) AS wlen
                 FROM v8),
               agg AS (SELECT
                   CAST(sum(freq * len(ps)) AS BIGINT) AS pieces_total,
                   CAST(sum(freq * wlen) AS BIGINT) AS chars_total
                 FROM st),
               vu AS (SELECT CAST(count(DISTINCT trim(u.t, '|'))
                     AS BIGINT) AS vocab_used
                 FROM st, LATERAL unnest(ps) AS u(t))
             SELECT vocab_used, pieces_total,
               CAST(chars_total AS DOUBLE)
                 / CAST(pieces_total AS DOUBLE) AS chars_per_piece
             FROM agg, vu)
           UNION ALL
           SELECT 'unigram', vocab_used, pieces_total, chars_per_piece
           FROM (
             WITH RECURSIVE ${unigramCtes(4, 30, 3)},
               st AS (SELECT ps, freq, CAST(length(w) AS BIGINT) AS wlen
                 FROM wk3 WHERE i = 0),
               agg AS (SELECT
                   CAST(sum(freq * len(ps)) AS BIGINT) AS pieces_total,
                   CAST(sum(freq * wlen) AS BIGINT) AS chars_total
                 FROM st),
               vu AS (SELECT CAST(count(DISTINCT u.t) AS BIGINT)
                     AS vocab_used
                 FROM st, LATERAL unnest(ps) AS u(t))
             SELECT vocab_used, pieces_total,
               CAST(chars_total AS DOUBLE)
                 / CAST(pieces_total AS DOUBLE) AS chars_per_piece
             FROM agg, vu))
         ORDER BY tokenizer""",
    // t30: the identical 8 greedy rounds unrolled (wrapped replace,
    // same arg-max tie order, MATERIALIZED per round).
    "t30_bpe_train" -> bpeSql(merges = 8),
    // t31: the same replay closed by the final state's weighted
    // subword counts.
    "t31_bpe_segment" -> bpeSegmentSql(merges = 8, topK = 20),
    "t12_bpe_pairs" ->
      s"""WITH w AS (SELECT u.t AS w FROM documents,
             LATERAL unnest($Toks) AS u(t)),
         f AS (SELECT w, count(*) AS freq FROM w GROUP BY w),
         p AS (SELECT substring(f.w, CAST(r.i AS INTEGER), 2) AS pair,
                 f.freq
               FROM f, LATERAL unnest(range(1, length(f.w))) AS r(i)
               WHERE length(f.w) >= 2)
         SELECT pair, CAST(sum(freq) AS BIGINT) AS cnt FROM p
         GROUP BY pair ORDER BY cnt DESC, pair ASC LIMIT 20""",
    "t15_freq_items" ->
      """SELECT source AS item, count(*) AS cnt FROM documents
         GROUP BY source ORDER BY cnt DESC, item""",
    // t22: same vowel-run counts via regexp_extract_all; scores spelled
    // in the identical literal association.
    "t22_readability" ->
      s"""WITH t AS (SELECT doc_id, $Toks AS ws FROM documents),
         c AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS words,
             CAST(COALESCE(list_sum(list_transform(ws, x ->
               greatest(1, len(regexp_extract_all(x, '[aeiouy]+'))))), 0)
               AS BIGINT) AS syl
           FROM t),
         s AS (SELECT doc_id, words,
             greatest(1, CAST(floor(CAST(words AS DOUBLE) / 15.0)
               AS BIGINT)) AS sentences, syl
           FROM c)
         SELECT doc_id, words, sentences, syl,
           CASE WHEN words > 0 THEN
             floor((206.835
               - 1.015 * (CAST(words AS DOUBLE) / sentences)
               - 84.6 * (CAST(syl AS DOUBLE) / words)) * 1e6 + 0.5) / 1e6
           END AS fre6,
           CASE WHEN words > 0 THEN
             floor((0.39 * (CAST(words AS DOUBLE) / sentences)
               + 11.8 * (CAST(syl AS DOUBLE) / words) - 15.59) * 1e6
               + 0.5) / 1e6
           END AS fk6
         FROM s ORDER BY doc_id""",
    "t18_lexical" ->
      s"""WITH t AS (SELECT doc_id, $Toks AS ts FROM documents),
         o AS (SELECT doc_id, len(ts) AS n, u.t AS t
           FROM t, LATERAL unnest(ts) AS u(t)),
         c AS (SELECT doc_id, n, t, count(*) AS c FROM o GROUP BY 1, 2, 3)
         SELECT doc_id, CAST(n AS INTEGER) AS n_tokens,
           count(*) AS n_types,
           CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_hapax,
           CAST(count(*) AS DOUBLE) / CAST(n AS DOUBLE) AS ttr,
           CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) AS hapax_frac
         FROM c GROUP BY doc_id, n ORDER BY doc_id""",
    // t17: non-exact decimal literals (1.2) are CAST AS DOUBLE — the p12
    // lesson: bare decimals seed DuckDB DECIMAL arithmetic whose rounding
    // differs from the Spark side's double path. (1.2 + 1) is spelled as
    // the sum, not 2.2: double(1.2)+1 != double(2.2).
    "t17_bm25" ->
      s"""WITH t AS (SELECT doc_id, $Toks AS ts FROM documents),
         st AS (SELECT doc_id, ts, len(ts) AS dl FROM t),
         g AS (SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
           FROM st),
         h AS (SELECT doc_id, dl, u.t FROM st, LATERAL unnest(ts) AS u(t)
           WHERE u.t IN ('broadcast', 'join', 'skew')),
         tf AS (SELECT doc_id, t, dl, count(*) AS tf
           FROM h GROUP BY 1, 2, 3),
         df AS (SELECT t, count(*) AS df FROM tf GROUP BY 1),
         w AS (SELECT tf.doc_id,
             ln((CAST((SELECT n FROM g) AS DOUBLE) - df.df + 0.5)
                 / (df.df + 0.5) + 1)
               * (tf.tf * (CAST(1.2 AS DOUBLE) + 1))
               / (tf.tf + CAST(1.2 AS DOUBLE) * (CAST(0.25 AS DOUBLE)
                 + CAST(0.75 AS DOUBLE) * tf.dl
                   / (SELECT avgdl FROM g))) AS w
           FROM tf JOIN df USING (t))
         SELECT doc_id, floor(sum(w) * 1e6 + 0.5) / 1e6 AS score
         FROM w GROUP BY 1 ORDER BY doc_id""",
    // t26: t16's metric CTEs, one flag aggregation, 5-stage union.
    "t26_filter_funnel" ->
      """WITH b AS (SELECT doc_id,
             CASE WHEN doc_id % 7 = 0 THEN text || ' ... # # #'
                  ELSE text END AS tx
           FROM documents),
         t AS (SELECT doc_id, tx,
             list_filter(string_split(lower(tx), ' '), t -> t <> '') AS ts
           FROM b),
         m AS (SELECT doc_id,
             CAST(len(ts) AS INTEGER) AS n_words,
             floor((CASE WHEN len(ts) = 0 THEN 0.0 ELSE
               list_sum(list_transform(ts, x -> length(x))) * 1.0
                 / len(ts) END) * 1e6 + 0.5) / 1e6 AS mean_wlen,
             floor((CASE WHEN len(ts) = 0 THEN 0.0 ELSE
               ((length(tx) - length(replace(tx, '#', '')))
                 + (length(tx) - length(replace(tx, '...', ''))) / 3)
                 * 1.0 / len(ts) END) * 1e6 + 0.5) / 1e6 AS sym_ratio,
             floor((CASE WHEN len(ts) = 0 THEN 0.0 ELSE
               len(list_filter(ts, x -> regexp_matches(x, '[a-z]')))
                 * 1.0 / len(ts) END) * 1e6 + 0.5) / 1e6 AS alpha_frac,
             CAST(len(list_filter(ts, x -> x IN ('the','be','to','of',
               'and','that','have','with'))) AS INTEGER) AS stop_count
           FROM t),
         f AS (SELECT
             (n_words >= 50 AND n_words <= 100000) AS o1,
             (mean_wlen >= 3.0 AND mean_wlen <= 10.0) AS o2,
             (sym_ratio <= 0.1) AS o3,
             (alpha_frac >= 0.8) AS o4,
             (stop_count >= 2) AS o5
           FROM m),
         a AS (SELECT CAST(count(*) AS BIGINT) AS n_total,
             CAST(sum(CASE WHEN o1 THEN 1 ELSE 0 END) AS BIGINT) AS p1,
             CAST(sum(CASE WHEN o2 THEN 1 ELSE 0 END) AS BIGINT) AS p2,
             CAST(sum(CASE WHEN o3 THEN 1 ELSE 0 END) AS BIGINT) AS p3,
             CAST(sum(CASE WHEN o4 THEN 1 ELSE 0 END) AS BIGINT) AS p4,
             CAST(sum(CASE WHEN o5 THEN 1 ELSE 0 END) AS BIGINT) AS p5,
             CAST(sum(CASE WHEN o1 AND o2 THEN 1 ELSE 0 END) AS BIGINT)
               AS c2,
             CAST(sum(CASE WHEN o1 AND o2 AND o3 THEN 1 ELSE 0 END)
               AS BIGINT) AS c3,
             CAST(sum(CASE WHEN o1 AND o2 AND o3 AND o4 THEN 1 ELSE 0
               END) AS BIGINT) AS c4,
             CAST(sum(CASE WHEN o1 AND o2 AND o3 AND o4 AND o5 THEN 1
               ELSE 0 END) AS BIGINT) AS c5
           FROM f)
         SELECT stage, n_total, n_pass, n_cum,
           floor(CAST(n_cum AS DOUBLE) / CAST(n_total AS DOUBLE)
             * 1e6 + 0.5) / 1e6 AS cum_rate6
         FROM (
           SELECT '1_words' AS stage, n_total, p1 AS n_pass, p1 AS n_cum
             FROM a
           UNION ALL SELECT '2_wlen', n_total, p2, c2 FROM a
           UNION ALL SELECT '3_sym', n_total, p3, c3 FROM a
           UNION ALL SELECT '4_alpha', n_total, p4, c4 FROM a
           UNION ALL SELECT '5_stops', n_total, p5, c5 FROM a)
         ORDER BY stage""",
    "t16_gopher" ->
      """WITH b AS (SELECT doc_id,
             CASE WHEN doc_id % 7 = 0 THEN text || ' ... # # #'
                  ELSE text END AS tx
           FROM documents),
         t AS (SELECT doc_id, tx,
             list_filter(string_split(lower(tx), ' '), t -> t <> '') AS ts
           FROM b),
         m AS (SELECT doc_id,
             CAST(len(ts) AS INTEGER) AS n_words,
             floor((CASE WHEN len(ts) = 0 THEN 0.0 ELSE
               list_sum(list_transform(ts, x -> length(x))) * 1.0
                 / len(ts) END) * 1e6 + 0.5) / 1e6 AS mean_wlen,
             floor((CASE WHEN len(ts) = 0 THEN 0.0 ELSE
               ((length(tx) - length(replace(tx, '#', '')))
                 + (length(tx) - length(replace(tx, '...', ''))) / 3)
                 * 1.0 / len(ts) END) * 1e6 + 0.5) / 1e6 AS sym_ratio,
             floor((CASE WHEN len(ts) = 0 THEN 0.0 ELSE
               len(list_filter(ts, x -> regexp_matches(x, '[a-z]')))
                 * 1.0 / len(ts) END) * 1e6 + 0.5) / 1e6 AS alpha_frac,
             CAST(len(list_filter(ts, x -> x IN ('the','be','to','of',
               'and','that','have','with'))) AS INTEGER) AS stop_count
           FROM t)
         SELECT doc_id, n_words, mean_wlen, sym_ratio, alpha_frac,
           stop_count,
           (n_words >= 50 AND n_words <= 100000) AS ok_words,
           (mean_wlen >= 3.0 AND mean_wlen <= 10.0) AS ok_wlen,
           (sym_ratio <= 0.1) AS ok_sym,
           (alpha_frac >= 0.8) AS ok_alpha,
           (stop_count >= 2) AS ok_stops,
           (n_words >= 50 AND n_words <= 100000
             AND mean_wlen >= 3.0 AND mean_wlen <= 10.0
             AND sym_ratio <= 0.1 AND alpha_frac >= 0.8
             AND stop_count >= 2) AS pass
         FROM m ORDER BY doc_id""",
    // chr(769) = U+0301 combining acute, chr(778) = U+030A combining ring
    // — the same decomposed splice the Spark side appends; NFC composes
    // both, so length and md5 must byte-match
    "t13_normalize" ->
      """WITH n AS (SELECT doc_id,
             regexp_replace(
               nfc_normalize(text || ' cafe' || chr(769) || ' a' ||
                 chr(778) || 'bc' || chr(7) || chr(127)),
               '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g') AS norm
           FROM documents)
         SELECT doc_id, CAST(length(norm) AS INTEGER) AS n_chars,
           md5(norm) AS fp
         FROM n ORDER BY doc_id""",
    "t14_sentences" ->
      s"""WITH t AS (SELECT doc_id,
             list_filter(list_transform(
               regexp_split_to_array(
                 text || '. first tail! second tail?? third... end.',
                 '[.!?]+\\s*'), x -> trim(x)),
               x -> x <> '') AS ss
           FROM documents),
         e AS (SELECT doc_id, CAST(r.i AS INTEGER) AS sent_id,
                 ss[CAST(r.i + 1 AS INTEGER)] AS sentence
               FROM t, LATERAL unnest(range(0, len(ss))) AS r(i))
         SELECT doc_id, sent_id, sentence,
           CAST(len(list_filter(string_split(lower(sentence), ' '),
             t -> t <> '')) AS INTEGER) AS n_tokens
         FROM e ORDER BY doc_id, sent_id""",
    // t19: lift is spelled in the Spark side's exact association —
    // ((cxy*nt)*nt) / ((nb*cx)*cy), one division — so the double is
    // bit-identical; round6 absorbs the libm ln() tail. Ordering is on
    // the rounded pmi (ulp ties order identically), tie-broken by gram.
    "t19_pmi" ->
      s"""WITH t AS (SELECT $Toks AS ts FROM documents),
         n AS (SELECT CAST(sum(len(ts)) AS DOUBLE) AS nt,
             CAST(sum(CASE WHEN len(ts) > 1 THEN len(ts) - 1 ELSE 0 END)
               AS DOUBLE) AS nb
           FROM t),
         b AS (SELECT ts[CAST(r.i AS INTEGER)] AS w1,
             ts[CAST(r.i + 1 AS INTEGER)] AS w2
           FROM t, LATERAL unnest(range(1, len(ts))) AS r(i)),
         pc AS (SELECT w1 || ' ' || w2 AS g, w1, w2, count(*) AS cxy
           FROM b GROUP BY 1, 2, 3 HAVING count(*) >= 5),
         u AS (SELECT u.t AS w, count(*) AS c
           FROM t, LATERAL unnest(ts) AS u(t) GROUP BY 1),
         sc AS (SELECT pc.g, pc.cxy, ua.c AS cx, ub.c AS cy,
             floor(ln((CAST(pc.cxy AS DOUBLE) * n.nt * n.nt)
               / ((n.nb * ua.c) * ub.c)) * 1e6 + 0.5) / 1e6 AS pmi
           FROM pc
           JOIN u ua ON pc.w1 = ua.w
           JOIN u ub ON pc.w2 = ub.w
           CROSS JOIN n)
         SELECT g, cxy, cx, cy, pmi FROM sc
         ORDER BY pmi DESC, g ASC LIMIT 30""",
    // t20: per-term ln values snap to exact 1e-6-unit BIGINTs before
    // summation (order-free), and the closing slope divides the same
    // exact integers in the same association as the Spark driver probe.
    "t20_zipf" ->
      s"""WITH t AS (SELECT $Toks AS ts FROM documents),
         u AS (SELECT u.t AS t FROM t, LATERAL unnest(ts) AS u(t)),
         vocab AS (SELECT t, count(*) AS freq FROM u GROUP BY 1
           HAVING count(*) >= 5),
         ranked AS (SELECT t, freq,
             CAST(row_number() OVER (ORDER BY freq DESC, t ASC) AS BIGINT)
               AS rank
           FROM vocab),
         s AS (SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(floor(ln(CAST(rank AS DOUBLE)) * 1e6 + 0.5)
               AS BIGINT)) AS BIGINT) AS sx,
             CAST(sum(CAST(floor(ln(CAST(freq AS DOUBLE)) * 1e6 + 0.5)
               AS BIGINT)) AS BIGINT) AS sy,
             CAST(sum(CAST(floor(ln(CAST(rank AS DOUBLE))
                 * ln(CAST(freq AS DOUBLE)) * 1e6 + 0.5)
               AS BIGINT)) AS BIGINT) AS sxy,
             CAST(sum(CAST(floor(ln(CAST(rank AS DOUBLE))
                 * ln(CAST(rank AS DOUBLE)) * 1e6 + 0.5)
               AS BIGINT)) AS BIGINT) AS sxx
           FROM ranked)
         SELECT r.t AS token, r.freq, r.rank,
           floor((n * (sxy / 1e6) - (sx / 1e6) * (sy / 1e6))
             / (n * (sxx / 1e6) - (sx / 1e6) * (sx / 1e6))
             * 1e6 + 0.5) / 1e6 AS slope6
         FROM ranked r CROSS JOIN s ORDER BY rank""",
    // t28: t05's prediction CTE composed with e49's report closing.
    "t28_langid_eval" ->
      s"""WITH tx AS (SELECT lang, $SpliceLangSql AS text FROM documents),
         t0 AS (SELECT lang AS label, ${scriptCaseSql("text")} AS script,
           $Toks AS ts FROM tx),
         sc AS (SELECT label, script, $MarkerColsSql FROM t0),
         p AS (SELECT label,
             COALESCE(script, $LatinCaseSql) AS pred
           FROM sc),
         cells AS (SELECT label, pred, count(*) AS cnt
           FROM p GROUP BY 1, 2),
         r AS (SELECT label, CAST(sum(cnt) AS BIGINT) AS n_actual
           FROM cells GROUP BY 1),
         c AS (SELECT pred AS label, CAST(sum(cnt) AS BIGINT) AS n_pred
           FROM cells GROUP BY 1),
         dg AS (SELECT label, CAST(cnt AS BIGINT) AS tp
           FROM cells WHERE label = pred),
         m AS (SELECT COALESCE(r.label, c.label) AS label,
             COALESCE(n_actual, 0) AS n_actual,
             COALESCE(n_pred, 0) AS n_pred
           FROM r FULL OUTER JOIN c ON r.label = c.label),
         mm AS (SELECT m.label, n_actual, n_pred,
             COALESCE(tp, 0) AS tp
           FROM m LEFT JOIN dg ON m.label = dg.label),
         t AS (SELECT CAST(sum(n_actual) AS BIGINT) AS n,
             CAST(sum(tp) AS BIGINT) AS stp,
             CAST(sum(n_actual * n_pred) AS BIGINT) AS src FROM mm)
         SELECT label, tp, n_pred - tp AS fp, n_actual - tp AS fn,
           CASE WHEN n_pred > 0 THEN
             floor(CAST(tp AS DOUBLE) / n_pred * 1e6 + 0.5) / 1e6
           END AS prec6,
           CASE WHEN n_actual > 0 THEN
             floor(CAST(tp AS DOUBLE) / n_actual * 1e6 + 0.5) / 1e6
           END AS rec6,
           CASE WHEN n_pred + n_actual > 0 THEN
             floor(2.0 * CAST(tp AS DOUBLE)
               / CAST(2 * tp + (n_pred - tp) + (n_actual - tp) AS DOUBLE)
               * 1e6 + 0.5) / 1e6
           END AS f16,
           floor(CAST(stp AS DOUBLE) / n * 1e6 + 0.5) / 1e6 AS accuracy6,
           CASE WHEN n * n - src > 0 THEN
             floor(CAST(n * stp - src AS DOUBLE)
               / CAST(n * n - src AS DOUBLE) * 1e6 + 0.5) / 1e6
           END AS kappa6
         FROM mm, t ORDER BY label""",
    // t27: per-doc trigram counts closed by sum/max; DuckDB's int sum
    // widens to HUGEINT → cast back to Spark's BIGINT.
    "t27_top_ngram" ->
      s"""WITH t AS (SELECT doc_id, $Toks AS ts FROM documents),
         b AS (SELECT doc_id, ts[CAST(r.i AS INTEGER)] || ' '
               || ts[CAST(r.i + 1 AS INTEGER)] || ' '
               || ts[CAST(r.i + 2 AS INTEGER)] AS g
           FROM t, LATERAL unnest(range(1, len(ts) - 1)) AS r(i)),
         c AS (SELECT doc_id, g, count(*) AS c FROM b GROUP BY 1, 2)
         SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_grams,
           max(c) AS top_cnt,
           floor(CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE)
             * 1e6 + 0.5) / 1e6 AS top_share6
         FROM c GROUP BY doc_id ORDER BY doc_id""",
    // t32: the full two-stage detector mirrored over the SAME sample
    // rows the Spark gate builds (interpolated from scriptSamples —
    // one source of truth for the probe bytes).
    "t32_script_langid" -> {
      // '' -escape the interpolated probe text: the current samples are
      // quote-free, but a future apostrophe-bearing probe must not
      // silently malform the VALUES clause
      val values = scriptSamples.map { case (i, w, t) =>
        s"(CAST($i AS BIGINT), '${w.replace("'", "''")}', " +
          s"'${t.replace("'", "''")}')"
      }.mkString(",\n           ")
      s"""WITH v(sid, want, text) AS (VALUES
           $values),
         t AS (SELECT sid, want, ${scriptCaseSql("text")} AS script,
           $Toks AS ts FROM v),
         sc AS (SELECT sid, want, script, $MarkerColsSql FROM t)
         SELECT sid, want, COALESCE(script, $LatinCaseSql) AS pred_lang
         FROM sc ORDER BY sid"""
    },
    // t33: the same two-stage mirror with the zero-signal wrap — no
    // script claim AND zero total markers -> 'und'.
    "t33_langid_route" ->
      s"""WITH t AS (SELECT doc_id, ${scriptCaseSql("text")} AS script,
           $Toks AS ts FROM documents),
         sc AS (SELECT doc_id, script, $MarkerColsSql FROM t)
         SELECT doc_id, COALESCE(script,
           CASE WHEN en + es + de + fr = 0 THEN 'und'
             ELSE $LatinCaseSql END) AS pred_lang
         FROM sc ORDER BY doc_id"""
  )
}
