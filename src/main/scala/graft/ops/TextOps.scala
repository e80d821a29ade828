package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Text-analysis building blocks for large-scale training-data pipelines:
  * tokenization, token counting, quality scoring, language-ID heuristic,
  * tf-idf, and document fingerprinting.
  *
  * Everything here is a native Catalyst `Column` expression (split /
  * regexp_extract_all / higher-order array functions / md5) — codegen'd,
  * pushdown-friendly, zero UDFs. At 100 TB these run as a single projected
  * scan per document batch; the only shuffles are the explicit term-level
  * aggregations in the query layer. The one DataFrame-level op, [[lmScore]],
  * is corpus-level by nature (it trains the count tables it scores with).
  */
object TextOps {

  /** Whitespace tokens of the lowercased text, empties dropped. */
  def tokens(text: Column): Column =
    filter(split(lower(text), " +"), t => t =!= "")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish token count: word pieces OR single non-word non-space symbols.
    * Explicit character classes (not \\w) so Java and RE2-family regex
    * engines agree. */
  def regexTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text),
      lit("[a-z0-9_]+|[^a-z0-9_\\s]"), lit(0)))

  /** Distinct whitespace tokens (the doc's term set). */
  def termSet(text: Column): Column = array_distinct(tokens(text))

  private val Stopwords =
    Seq("the", "a", "an", "of", "and", "to", "in", "is", "on", "for", "with")

  /** Fraction of tokens that are stopwords (0 for empty docs). */
  def stopwordRatio(text: Column): Column = {
    val ts = tokens(text)
    val stops = filter(ts, t => t.isin(Stopwords: _*))
    when(size(ts) === 0, lit(0.0))
      .otherwise(size(stops).cast("double") / size(ts).cast("double"))
  }

  /** Mean token length in characters (0 for empty docs). */
  def meanTokenLength(text: Column): Column = {
    val ts = tokens(text)
    when(size(ts) === 0, lit(0.0))
      .otherwise(
        aggregate(ts, lit(0), (acc, t) => acc + length(t)).cast("double")
          / size(ts).cast("double"))
  }

  /** Punctuation character count (explicit class, engine-portable). */
  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[.,!?;:'\"()\\[\\]{}-]", ""))

  /** BM25 relevance of every document against one bag-of-words query
    * (Robertson/Sparck-Jones; the retrieval primitive a corpus-curation
    * stack uses for targeted slicing). Classic Okapi form with the +1
    * idf floor: `idf(t) = ln((N − df + 0.5)/(df + 0.5) + 1)`,
    * `score = Σ_t idf·tf·(k1+1)/(tf + k1·(1 − b + b·dl/avgdl))`.
    *
    * Scale shape: ONE tokenize pass (staged array → explode) filtered to
    * the query terms BEFORE any exchange, so the shuffles carry only
    * (doc, query-term) rows: a per-(doc, term) tf aggregate, a per-term
    * df aggregate (bounded by |query| rows, broadcast back), and one
    * per-doc closing sum. N and avgdl are two driver scalars from one
    * 1-row probe; avgdl = exact-integer sum / exact count — identical in
    * any engine. The only float ops (ln, the saturation quotient) run on
    * identical doubles; the per-doc term sum is order-sensitive at 1 ulp
    * — callers gate output through round6. */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
           query: Seq[String], k1: Double = 1.2,
           b: Double = 0.75): DataFrame = {
    require(query.nonEmpty, "bm25 needs at least one query term")
    val staged = docs.select(col(idCol), tokens(col(textCol)).as("__ts"))
      .select(col(idCol), col("__ts"), size(col("__ts")).as("dl"))
    val stats = staged.agg(count(lit(1)), sum(col("dl"))).head()
    val n = stats.getLong(0)
    val avgdl = stats.getLong(1).toDouble / n
    val hits = staged
      .select(col(idCol), col("dl"), explode(col("__ts")).as("t"))
      .filter(col("t").isin(query: _*))
    // The tf frame persists once (Caches-tracked, (doc × query-term)
    // rows) and serves BOTH the df branch and the scoring join — without
    // it the df branch re-runs the whole tokenize+explode scan (the d15
    // one-pass rule).
    val tf = graft.Caches.track(
      hits.groupBy(col(idCol), col("t"), col("dl"))
        .agg(count(lit(1)).as("tf"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val dfreq = tf.groupBy(col("t"))
      .agg(count(lit(1)).as("df")) // ≤ |query| rows
    tf.join(broadcast(dfreq), "t")
      .withColumn("__idf",
        log((lit(n.toDouble) - col("df") + 0.5) / (col("df") + 0.5) + 1.0))
      .withColumn("__w",
        col("__idf") * (col("tf") * (k1 + 1.0))
          / (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / avgdl)))
      .groupBy(col(idCol))
      .agg(sum(col("__w")).as("score"))
  }

  /** Lexical-diversity metrics per document: type-token ratio
    * (distinct/total), hapax fraction (share of distinct terms occurring
    * exactly once in the doc), and the underlying counts. Shape: one
    * staged tokenize pass → explode → (doc, term) partial+final count
    * (NO exchange when the input is doc-spread — the d15 clustering
    * effect) → one per-doc closing aggregate. Linear in corpus tokens —
    * a per-row nested-filter spelling would be O(types·len) per doc,
    * quadratic on long documents. Ratios are exact integer/integer
    * divisions. Low TTR flags boilerplate/repetition (the t07 family's
    * vocabulary-level sibling). */
  def lexicalDiversity(df: org.apache.spark.sql.DataFrame, idCol: String,
                       textCol: String): org.apache.spark.sql.DataFrame = {
    val staged = df.select(col(idCol), tokens(col(textCol)).as("__ts"))
    val occ = staged
      .select(col(idCol), size(col("__ts")).as("__n"),
        explode(col("__ts")).as("__t"))
      .groupBy(col(idCol), col("__n"), col("__t"))
      .agg(count(lit(1)).as("__c"))
    occ.groupBy(col(idCol))
      .agg(first(col("__n")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("__c") === 1, 1L).otherwise(0L)).as("n_hapax"))
      .withColumn("ttr",
        col("n_types").cast("double") / col("n_tokens").cast("double"))
      .withColumn("hapax_frac",
        col("n_hapax").cast("double") / col("n_types").cast("double"))
  }

  /** Flesch readability metrics (Reading Ease + Kincaid grade) over the
    * vowel-group syllable heuristic: syllables(w) = max(1, count of
    * maximal `[aeiouy]+` runs) — the standard dictionary-free
    * approximation. The fixture text carries no sentence punctuation
    * (FIXTURES.md), so sentence segmentation is the documented synthetic
    * `max(1, ⌊words/15⌋)`; swap in a real boundary count when the corpus
    * has one. ONE staged scan: token array materialized once, the
    * per-token transform+aggregate stays inside the projection.
    *
    * Determinism: words/syllables/sentences are exact integers; both
    * scores are one fixed-association literal expression of two
    * integer ratios on the 6dp floor grid, spelled identically in the
    * oracle. Empty docs get null scores, never 0/0. */
  def readability(df: org.apache.spark.sql.DataFrame, idCol: String,
                  textCol: String): org.apache.spark.sql.DataFrame = {
    val staged = df.select(col(idCol), tokens(col(textCol)).as("__ts"))
    val counted = staged.select(col(idCol),
      size(col("__ts")).cast("long").as("words"),
      coalesce(aggregate(
        transform(col("__ts"),
          t => greatest(lit(1), regexp_count(t, lit("[aeiouy]+")))
            .cast("long")),
        lit(0L), (acc, x) => acc + x), lit(0L)).as("syl"))
      .withColumn("sentences", greatest(lit(1L),
        floor(col("words").cast("double") / lit(15.0)).cast("long")))
    val wps = col("words").cast("double") / col("sentences").cast("double")
    val spw = col("syl").cast("double") / col("words").cast("double")
    counted.select(col(idCol), col("words"), col("sentences"), col("syl"),
      when(col("words") > 0L, round6(
        lit(206.835) - lit(1.015) * wps - lit(84.6) * spw)).as("fre6"),
      when(col("words") > 0L, round6(
        lit(0.39) * wps + lit(11.8) * spw - lit(15.59))).as("fk6"))
  }

  private val GopherStops =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher-style corpus quality rules (Rae et al. 2021, the MassiveWeb
    * repetition-free filter set): word-count bounds, mean-word-length
    * bounds, symbol-to-word ratio (`#` and `...`), alphabetic-word
    * fraction, and a minimum stop-word count. Takes the STAGED raw text
    * and token-array attributes (never subtrees — lambda bodies over an
    * alias re-evaluate the whole chain per element), emits the metrics
    * plus per-rule booleans and the conjunction. Ratios are integer /
    * integer divisions — exact IEEE, engine-portable — snapped to the
    * 6dp floor grid before both output and threshold comparison so both
    * engines compare identical doubles. Pure projections: one codegen'd
    * scan, no shuffle. */
  def gopherRules(df: org.apache.spark.sql.DataFrame, idCol: String,
                  textCol: String, toksCol: String): org.apache.spark.sql.DataFrame = {
    val tx = col(textCol)
    val ts = col(toksCol)
    val n = size(ts)
    val hashN = length(tx) - length(replace(tx, lit("#"), lit("")))
    val ellN = (length(tx) - length(replace(tx, lit("..."), lit("")))) / 3
    val meanLen = when(n === 0, lit(0.0)).otherwise(
      aggregate(ts, lit(0), (acc, t) => acc + length(t)).cast("double")
        / n.cast("double"))
    val symRatio = when(n === 0, lit(0.0)).otherwise(
      (hashN + ellN).cast("double") / n.cast("double"))
    val alphaFrac = when(n === 0, lit(0.0)).otherwise(
      size(filter(ts, t => t.rlike("[a-z]"))).cast("double")
        / n.cast("double"))
    val stopN = size(filter(ts, t => t.isin(GopherStops: _*)))
    df.select(col(idCol), n.as("n_words"),
        round6(meanLen).as("mean_wlen"), round6(symRatio).as("sym_ratio"),
        round6(alphaFrac).as("alpha_frac"), stopN.as("stop_count"))
      .withColumn("ok_words", col("n_words") >= 50 && col("n_words") <= 100000)
      .withColumn("ok_wlen", col("mean_wlen") >= 3.0 && col("mean_wlen") <= 10.0)
      .withColumn("ok_sym", col("sym_ratio") <= 0.1)
      .withColumn("ok_alpha", col("alpha_frac") >= 0.8)
      .withColumn("ok_stops", col("stop_count") >= 2)
      .withColumn("pass", col("ok_words") && col("ok_wlen") && col("ok_sym")
        && col("ok_alpha") && col("ok_stops"))
  }

  /** TRUE BPE tokenizer TRAINING (Sennrich et al. 2016) over the corpus
    * VOCABULARY: distinct words + frequencies are the training set (the
    * classic formulation — symbol sequences start as characters), each
    * round counts adjacent symbol pairs weighted by word frequency,
    * merges the arg-max pair everywhere (ties → lexicographically
    * smallest), and records it. Returns the merge table
    * (round, lhs, rhs, merged, cnt) — the artifact a tokenizer ships;
    * t12's pair statistics were the diagnostic, this is the loop.
    *
    * ENGINE-PORTABLE merge step: symbol sequences are carried as
    * '|'-wrapped space-joined strings ('|a| |b| …'), so "merge (a,b)
    * greedily left-to-right, non-overlapping" is EXACTLY one
    * replace('|a| |b|' → '|ab|') — identical semantics in Spark and
    * DuckDB (adjacent repeats collapse once per pass like the
    * reference fold; wrappers prevent cross-symbol false matches; '|'
    * cannot occur in the ASCII-word fixture). Scale shape: the state
    * is the |vocab| frame, NOT the corpus — one corpus tokenize feeds
    * the frequency table, then every round is one staged split + pair
    * explode + count aggregate with a 1-ROW arg-max probe;
    * localCheckpoint cuts the replace chain per round. */
  def bpeTrain(df: DataFrame, textCol: String, merges: Int): DataFrame = {
    val spark = df.sparkSession
    val (out, _) = bpeLoop(df, textCol, merges)
    import spark.implicits._
    out.toDF("round", "lhs", "rhs", "merged", "cnt")
  }

  /** [[bpeTrain]] + APPLY in one call: train `merges` rounds, then
    * return the top-`topK` SUBWORD frequencies of the segmented corpus
    * (frequency-weighted over the vocabulary — identical to segmenting
    * every document). The vocabulary-coverage view of the trained
    * tokenizer: which subword units actually carry the corpus. */
  def bpeSegment(df: DataFrame, textCol: String, merges: Int,
                 topK: Int): DataFrame = {
    val (_, vFinal) = bpeLoop(df, textCol, merges)
    vFinal
      .select(explode(split(col("s"), " ")).as("t"), col("freq"))
      .groupBy(trim(col("t"), "|").as("subword"))
      .agg(sum(col("freq")).as("cnt"))
      .orderBy(col("cnt").desc, col("subword").asc)
      .limit(topK)
  }

  /** The shared greedy-merge loop: returns the merge table rows and the
    * FINAL segmented vocabulary state (s = wrapped symbol string,
    * freq). See [[bpeTrain]] for the portability contract. */
  private def bpeLoop(df: DataFrame, textCol: String, merges: Int)
      : (Seq[(Int, String, String, String, Long)], DataFrame) = {
    require(merges >= 1, "bpeTrain needs at least one merge round")
    var v = graft.Caches.track(df
      .select(explode(tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(concat_ws(" ",
          transform(sequence(lit(1), length(col("w"))),
            i => concat(lit("|"), col("w").substr(i, lit(1)), lit("|"))))
          .as("s"),
        col("freq"))
      .localCheckpoint())
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, String, Long)]
    (1 to merges).foreach { r =>
      val staged = v.select(split(col("s"), " ").as("ts"), col("freq"))
        .filter(size(col("ts")) >= 2) // single-symbol words carry no pair
      val m = staged
        .select(col("freq"),
          explode(transform(sequence(lit(1), size(col("ts")) - 1),
            i => struct(element_at(col("ts"), i).as("x"),
              element_at(col("ts"), i + lit(1)).as("y")))).as("pr"))
        .groupBy(col("pr.x").as("x"), col("pr.y").as("y"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("x").asc, col("y").asc)
        .head() // 1-row arg-max: the round's merge pair
      val (x, y, cnt) = (m.getString(0), m.getString(1), m.getLong(2))
      val lhs = x.substring(1, x.length - 1)
      val rhs = y.substring(1, y.length - 1)
      out += ((r, lhs, rhs, lhs + rhs, cnt))
      v = graft.Caches.track(
        v.select(replace(col("s"), lit(s"$x $y"), lit(s"|$lhs$rhs|"))
            .as("s"), col("freq"))
          .localCheckpoint()) // cut the replace chain per round
    }
    (out.toSeq, v)
  }

  /** Hashed-feature LOGISTIC-REGRESSION text classifier TRAINING — the
    * fastText-shaped quality/routing filter every mixture pipeline
    * trains (Joulin et al. 2016; trained here on weak labels the way a
    * crawl pipeline distills a heuristic or reference corpus into a
    * cheap scorer): features are token counts hashed into `dim` buckets
    * (+ a bias feature), the model is full-batch gradient descent for
    * `iters` fixed iterations. Returns the per-iteration weight trace
    * (iter, feat, w).
    *
    * ENGINE-PORTABLE NUMERICS — the whole loop is bit-identical on any
    * IEEE engine, with no transcendentals and no rounding-grid
    * gymnastics on the comparisons:
    *  - sigmoid is the RATIONAL σ̃(z) = 0.5 + z/(2(1+|z|)) — division
    *    is correctly rounded, exp is not;
    *  - residuals snap to the 2⁻²⁰ dyadic grid, so every gradient term
    *    r̃·x (x integer) is a dyadic rational and the per-feature SUM
    *    is EXACT in f64 regardless of partial/final association — the
    *    distributed aggregation cannot drift;
    *  - weights re-snap to the grid after each update, so per-doc
    *    margins Σ w·x are exact sums too.
    *
    * Scale shape: per iteration ONE keyed sum per doc (margin) + ONE
    * keyed sum per feature (gradient), both partial+final; only the
    * (dim+1)-row gradient ever reaches the driver. */
  def textClassifierTrain(df: DataFrame, idCol: String, textCol: String,
                          label: Column, dim: Int = 16,
                          iters: Int = 8,
                          memoKey: Option[String] = None): DataFrame = {
    val spark = df.sparkSession
    val (trace, _, _, _) =
      textClfLoop(df, idCol, textCol, label, dim, iters, memoKey)
    import spark.implicits._
    trace.toDF("iter", "feat", "w")
  }

  /** [[textClassifierTrain]] + SCORE: train, then score every doc with
    * the final weights. Returns (id, y, score, pred) — score is the
    * rational sigmoid of the exact margin, pred its 0.5 threshold.
    * One codegen'd scan + one keyed margin sum at inference. */
  def textClassifierScore(df: DataFrame, idCol: String, textCol: String,
                          label: Column, dim: Int = 16,
                          iters: Int = 8,
                          memoKey: Option[String] = None): DataFrame = {
    val (_, feats, labels, w) =
      textClfLoop(df, idCol, textCol, label, dim, iters, memoKey)
    val z = margins(feats, w)
    labels.join(z, Seq("id"))
      .select(col("id").as(idCol), col("y"),
        (lit(0.5) + col("z") / (lit(2.0) * (lit(1.0) + abs(col("z")))))
          .as("score"),
        when(col("z") >= 0, 1L).otherwise(0L).as("pred"))
  }

  /** CLASSIFIER FEATURE DATASHEET — unigram-only vs unigram+bigram
    * features trained on the SAME corpus and labels (the ablation the
    * actual fastText recipe motivates: Joulin et al. 2017 report
    * bag-of-words PLUS hashed bigrams; this gate answers whether the
    * bigram block pays for its 2× feature width on THIS corpus before a
    * pipeline commits to it — the t38 tokenizer-datasheet pattern).
    * Per variant: train via the shared exact-numerics GD loop, score
    * every doc with the final weights, close with ONE 1-row
    * (correct, n) probe; accuracy floors to the 6dp grid from exact
    * integers, so the two driver divisions are engine-identical.
    * Returns (features, correct, n, accuracy6), one row per variant. */
  def textClassifierCompare(df: DataFrame, idCol: String, textCol: String,
                            label: Column, dim: Int = 16,
                            iters: Int = 8,
                            memoKey: Option[String] = None): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    def acc(bigrams: Boolean): (Long, Long) = {
      val (_, feats, labels, w) =
        textClfLoop(df, idCol, textCol, label, dim, iters, memoKey, bigrams)
      val z = margins(feats, w)
      val r = labels.join(z, Seq("id"))
        .agg(sum(when((col("z") >= 0) === (col("y") === 1L), 1L)
          .otherwise(0L)).as("correct"),
          count(lit(1)).as("n"))
        .head() // 1-row accuracy probe
      (r.getLong(0), r.getLong(1))
    }
    val (cu, nu) = acc(bigrams = false)
    val (cb, nb) = acc(bigrams = true)
    def a6(c: Long, n: Long): Double =
      math.floor(c.toDouble / n * 1e6 + 0.5) / 1e6
    Seq(("unigram", cu, nu, a6(cu, nu)),
        ("unigram_bigram", cb, nb, a6(cb, nb)))
      .toDF("features", "correct", "n", "accuracy6")
  }

  /** Exact per-doc margins Σ_f w_f·x_f under grid-snapped weights (a
    * bounded driver array, shipped as a map literal). */
  private def margins(feats: DataFrame, w: Array[Double]): DataFrame = {
    val wm = map(w.zipWithIndex.flatMap { case (v, f) =>
      Seq(lit(f.toLong), lit(v)) }.toIndexedSeq: _*)
    feats
      .select(col("id"),
        (col("x").cast("double") * element_at(wm, col("feat"))).as("t"))
      .groupBy("id").agg(sum(col("t")).as("z"))
  }

  private val ClfGrid = 1048576.0 // 2^20 — the residual/weight grid

  /** The classifier FEATURE MAP alone — shared by the training loop and
    * the fixed-model scorer ([[textClassifierScoreWith]]): normalized
    * hashed token buckets (+ optional bigram block — the fastText
    * recipe, Joulin et al. 2017: hashed bigram frequencies in buckets
    * [dim, 2·dim), normalized by the doc's bigram count n−1; length and
    * bias ids shift up to stay disjoint), all grid-snapped. Pure
    * per-doc column logic: scoring a micro-batch with a frozen model
    * builds exactly these rows for the batch. */
  private def clfFeatures(df: DataFrame, idCol: String, textCol: String,
                          dim: Int, bigrams: Boolean): DataFrame = {
    def snapCol(c: Column): Column =
      floor(c * lit(ClfGrid) + lit(0.5)) / lit(ClfGrid)
    val base = df.select(col(idCol).as("id"), tokens(col(textCol)).as("__ts"))
    val lens = base.select(col("id"), size(col("__ts")).as("__n"))
    // normalized bucket frequencies (grid-snapped) + an explicit length
    // feature + bias: unnormalized counts make full-batch GD saturate in
    // the majority direction (the margin is dominated by doc length
    // through EVERY bucket); normalizing moves the length signal into
    // its own feature, where one weight + the bias can place the
    // boundary
    val bucket = base
      .select(col("id"), explode(col("__ts")).as("t"))
      .select(col("id"),
        pmod(graft.ops.DedupOps.portableHash60(col("t")),
          lit(dim.toLong)).as("feat"))
      .groupBy("id", "feat").agg(count(lit(1)).as("__c"))
      .join(lens, Seq("id"))
      .select(col("id"), col("feat"),
        snapCol(col("__c").cast("double")
          / greatest(col("__n"), lit(1)).cast("double")).as("x"))
    // bigram block: the codegen'd gram-text expression (staged before
    // its explode), hashed into the second dim-sized bucket range
    val bigr =
      if (!bigrams) None
      else Some(df
        .select(col(idCol).as("id"),
          graft.functions.NgramText.ngramText(col(textCol), 2).as("__bs"))
        .select(col("id"), explode(col("__bs")).as("b"))
        .select(col("id"),
          (lit(dim.toLong) + pmod(
            graft.ops.DedupOps.portableHash60(col("b")),
            lit(dim.toLong))).as("feat"))
        .groupBy("id", "feat").agg(count(lit(1)).as("__c"))
        .join(lens, Seq("id"))
        .select(col("id"), col("feat"),
          snapCol(col("__c").cast("double")
            / greatest(col("__n") - 1, lit(1)).cast("double")).as("x")))
    val nFeat = if (bigrams) 2L * dim else dim.toLong // length-feature id
    val lenFeat = lens.select(col("id"), lit(nFeat).as("feat"),
      snapCol(least(col("__n"), lit(512)).cast("double") / lit(512.0))
        .as("x"))
    val bias = df.select(col(idCol).as("id"),
      lit(nFeat + 1L).as("feat"), lit(1.0).as("x"))
    bigr.foldLeft(bucket)(_ unionByName _)
      .unionByName(lenFeat).unionByName(bias)
  }

  /** Train only — the bounded final weight vector, the MODEL a frozen
    * scorer ships to every micro-batch ([[textClassifierScoreWith]]);
    * memo-shared with the train/score gates via `memoKey`. */
  def textClassifierFit(df: DataFrame, idCol: String, textCol: String,
                        label: Column, dim: Int = 16, iters: Int = 8,
                        memoKey: Option[String] = None,
                        bigrams: Boolean = false): Array[Double] =
    textClfLoop(df, idCol, textCol, label, dim, iters, memoKey, bigrams)._4

  /** Score with a FROZEN model — the streaming/serving half of the
    * classifier: rebuild the per-doc feature map for THIS frame only
    * and close with the exact margins under the shipped weights.
    * Scores are per-doc independent, so scoring micro-batches and
    * unioning equals scoring the whole corpus at once (gate t44 proves
    * it against t37's oracle verbatim). Output = (id, y, score, pred),
    * [[textClassifierScore]]'s shape. */
  def textClassifierScoreWith(df: DataFrame, idCol: String,
                              textCol: String, label: Column,
                              w: Array[Double], dim: Int = 16,
                              bigrams: Boolean = false): DataFrame = {
    val feats = clfFeatures(df, idCol, textCol, dim, bigrams)
    val z = margins(feats, w)
    df.select(col(idCol).as("id"), label.cast("long").as("y"))
      .join(z, Seq("id"))
      .select(col("id").as(idCol), col("y"),
        (lit(0.5) + col("z") / (lit(2.0) * (lit(1.0) + abs(col("z")))))
          .as("score"),
        when(col("z") >= 0, 1L).otherwise(0L).as("pred"))
  }

  /** Shared GD loop over [[clfFeatures]]: returns (trace rows,
    * persisted feature frame, persisted label frame, final weights).
    * Driver state: the bounded weight array + one ≤(2·dim+2)-row
    * collect per iteration. */
  private def textClfLoop(df: DataFrame, idCol: String, textCol: String,
                          label: Column, dim: Int, iters: Int,
                          memoKey: Option[String] = None,
                          bigrams: Boolean = false)
      : (Seq[(Int, Long, Double)], DataFrame, DataFrame, Array[Double]) = {
    require(dim >= 2 && iters >= 1, "need dim >= 2, iters >= 1")
    def snapCol(c: Column): Column =
      floor(c * lit(ClfGrid) + lit(0.5)) / lit(ClfGrid)
    val nFeat = if (bigrams) 2L * dim else dim.toLong
    val feats = graft.Caches.track(
      clfFeatures(df, idCol, textCol, dim, bigrams)
        .persist(StorageLevel.MEMORY_AND_DISK))
    val labels = graft.Caches.track(df
      .select(col(idCol).as("id"), label.cast("long").as("y"))
      .persist(StorageLevel.MEMORY_AND_DISK))
    val n = labels.count().toDouble
    def snap(v: Double): Double =
      math.floor(v * ClfGrid + 0.5) / ClfGrid
    // training-artifact memo (the ivfBuild cacheKey contract): train and
    // score gates over the same corpus/label share ONE GD run per
    // session; keys must encode the corpus slice. Values are immutable
    // (Vector + the trace Seq); the closure runs OUTSIDE the memo lock.
    def runGd(): (Seq[(Int, Long, Double)], Vector[Double]) = {
    var w = Array.fill(nFeat.toInt + 2)(0.0)
    val trace = scala.collection.mutable.ArrayBuffer
      .empty[(Int, Long, Double)]
    (1 to iters).foreach { it =>
      val z = margins(feats, w)
      // residual on the dyadic grid: y − σ̃(z), snapped; each gradient
      // TERM r̃·x̃ snaps again, so the per-feature sum is a sum of
      // 2⁻²⁰-multiples ≤ 1 — exact in f64 to ~8.6 BILLION docs,
      // regardless of partial/final association
      val r = labels.join(z, Seq("id"))
        .select(col("id"),
          snapCol(col("y").cast("double")
            - (lit(0.5) + col("z")
              / (lit(2.0) * (lit(1.0) + abs(col("z")))))).as("r"))
      val g = feats.join(r, Seq("id"))
        .select(col("feat"), snapCol(col("r") * col("x")).as("t"))
        .groupBy("feat").agg(sum(col("t")).as("g"))
        .collect() // ≤ 2·dim+2 rows — bounded driver state
        .map(x => x.getLong(0) -> x.getDouble(1)).toMap
      w = w.zipWithIndex.map { case (wf, f) =>
        snap(wf + 4.0 * g.getOrElse(f.toLong, 0.0) / n) }
      trace ++= w.zipWithIndex.map { case (wf, f) => (it, f.toLong, wf) }
    }
    (trace.toSeq, w.toVector)
    }
    // the memo key MUST encode the feature recipe: t36/t37/p35 (unigram)
    // and t39's bigram variant share the corpus slice but train
    // different models
    val (trace, w) = memoKey.fold(runGd())(k =>
      graft.Caches.memo(s"clf:$k:d$dim:i$iters:b$bigrams")(runGd()))
    (trace, feats, labels, w.toArray)
  }

  /** SKIP-GRAM TRAINING PAIRS with frequency subsampling — word2vec's
    * data-prep pass (Mikolov et al. 2013 §2.3): vocabulary-trim tokens
    * below `minCount`, drop frequent tokens with keep probability
    * `min(1, (√(z/t)+1)·(t/z))` (z = the word's corpus frequency
    * share), COMPACT each doc's surviving sequence (the window applies
    * over survivors — subsampling widens effective context, the paper's
    * point), then emit every (center, context) pair within `window`
    * compacted positions, aggregated to counts.
    *
    * Determinism (engine-portable): the subsampling draw is the d05
    * md5 trick — u = first-15-hex of md5("id:pos:w") / 2⁶⁰, compared
    * against the keep probability computed from exact integer
    * frequency ratios (√ and ÷ are correctly rounded IEEE ops, so both
    * engines build the identical double and the compare cannot
    * diverge). Scale shape: one corpus scan + a |vocab| frequency
    * aggregate; compaction is a doc-keyed window; pairing is a doc-
    * keyed self-join under the window bound (never cross-doc); the
    * close is a (center, context) partial+final count. */
  def skipgramPairs(df: DataFrame, idCol: String, textCol: String,
                    window: Int, minCount: Long = 2,
                    subsampleT: Option[Double] = Some(1e-3)): DataFrame = {
    require(window >= 1, "skipgramPairs needs window >= 1")
    val toks = graft.Caches.track(df
      .select(col(idCol).as("id"), tokens(col(textCol)).as("__ts"))
      .select(col("id"), posexplode(col("__ts")))
      .select(col("id"), col("pos").cast("long").as("pos"),
        col("col").as("w"))
      .persist(StorageLevel.MEMORY_AND_DISK))
    val freq = toks.groupBy("w").agg(count(lit(1)).as("f"))
    // subsampleT = None: pure vocabulary-trimmed window pairs (the
    // deterministic input sgnsTrain's oracle replays without the draw)
    val keepDraw = subsampleT.fold(lit(true)) { t =>
      val nTot = toks.count() // corpus token total: one driver scalar
      val z = col("f").cast("double") / lit(nTot.toDouble)
      val pKeep = least(lit(1.0),
        (sqrt(z / lit(t)) + lit(1.0)) * (lit(t) / z))
      val u = graft.ops.DedupOps.portableHash60(
        concat_ws(":", col("id").cast("string"),
          col("pos").cast("string"), col("w"))).cast("double") /
        lit(1152921504606846976.0) // 2^60 — the d05 uniform draw
      u < pKeep
    }
    val kept = toks.join(freq, Seq("w"))
      .filter(col("f") >= minCount && keepDraw)
    val comp = kept.select(col("id"), col("w"),
      row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy("id").orderBy("pos")).as("np"))
    comp.as("a").join(comp.as("b"),
        col("a.id") === col("b.id") && col("a.np") =!= col("b.np")
          && abs(col("a.np") - col("b.np")) <= window)
      .groupBy(col("a.w").as("center"), col("b.w").as("context"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** IN-ENGINE WORD2VEC TRAINING — skip-gram with EXPECTED negative
    * sampling (SGNS, Mikolov et al. 2013), full-batch gradient descent
    * under the same exact-numerics contract as
    * [[textClassifierTrain]]'s GD: the whole optimization replays
    * bit-identically on any IEEE engine, so trained EMBEDDINGS (not
    * just scores) sit under a DuckDB oracle.
    *
    * Construction: positives = [[skipgramPairs]] WITHOUT subsampling
    * (vocab-trimmed window pairs with counts); negatives in
    * EXPECTATION — instead of k random draws per pair, every (center,
    * noise word) cell carries weight `negK · n_c · q(noise)` with
    * q ∝ f^0.75 ([[negativeSampling]]'s √-spelled distribution) — the
    * expected SGNS loss, deterministic and sampling-noise-free. The
    * negative block is |centers|×|vocab| — VOCABULARY-squared, bounded
    * like the co-occurrence matrices of GloVe-class trainers, never
    * corpus-sized (at web scale swap in per-pair sampled negatives via
    * the md5 draw; the gradient algebra is unchanged). Loss:
    * `Σ⁺ cnt·log σ(u_c·v_x) + Σ⁻ wgt·log σ(−u_c·v_n)`.
    *
    * Exactness: embeddings init from the md5-uniform draw and live on
    * the 2⁻²⁰ dyadic grid; pair scores are sums of products of grid
    * multiples (exact dyadic rationals, association-free); residuals
    * use the rational sigmoid and re-snap; every gradient TERM snaps
    * before the per-(word, dim) sum; updates re-snap after the
    * binary-exact-η step. Scale shape per iteration: two (word)-keyed
    * joins to score, two keyed gradient aggregations, one |vocab|·dim
    * update join — lineage cut per iteration; driver state = three
    * scalars (the noise distribution never leaves the cluster — the
    * expected-negative block is [[sgnsWw]]'s bucketed equi-join, and
    * the serialized plan is vocab-independent).
    * Returns (role ∈ in|out, w, j, val) — both embedding matrices. */
  def sgnsTrain(df: DataFrame, idCol: String, textCol: String,
                window: Int = 3, minCount: Long = 2, dim: Int = 4,
                negK: Double = 2.0, eta: Double = 0.5,
                iters: Int = 3,
                memoKey: Option[String] = None,
                sampled: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val m = sgnsMatrix(df, idCol, textCol, window, minCount, dim, negK,
      eta, iters, memoKey, sampled).toDF("w", "j", "u", "v")
    m.select(lit("in").as("role"), col("w"), col("j"),
        col("u").as("val"))
      .unionByName(m.select(lit("out").as("role"), col("w"), col("j"),
        col("v").as("val")))
  }

  /** The shared SGNS training loop, closed by ONE |vocab|·dim collect
    * of the final matrices (the kmeans-centroid contract: training runs
    * distributed, only the bounded model ships to the driver) — memo
    * behind `memoKey` so the train/probe gate pair trains once per
    * session (keys must encode the corpus slice). */
  private def sgnsMatrix(df: DataFrame, idCol: String, textCol: String,
                         window: Int, minCount: Long, dim: Int,
                         negK: Double, eta: Double, iters: Int,
                         memoKey: Option[String],
                         sampled: Boolean = false)
      : Vector[(String, Int, Double, Double)] = {
    require(dim >= 1 && iters >= 1, "need dim >= 1, iters >= 1")
    def run(): Vector[(String, Int, Double, Double)] = {
    def snapCol(c: Column): Column =
      floor(c * lit(ClfGrid) + lit(0.5)) / lit(ClfGrid)
    def sig(s: Column): Column =
      lit(0.5) + s / (lit(2.0) * (lit(1.0) + abs(s)))
    val (pairs, freq) = sgnsInputs(df, idCol, textCol, window, minCount)
    val ww = graft.Caches.track(
      (if (sampled) sgnsWwSampled(pairs, freq, negK)
       else sgnsWw(pairs, freq, negK))
        .persist(StorageLevel.MEMORY_AND_DISK))
    val nw = pairs.agg(sum(col("cnt"))).head().getLong(0).toDouble // 1-row
    def draw(side: String): Column = snapCol(
      (graft.ops.DedupOps.portableHash60(concat_ws(":", lit(side),
          col("w"), col("j").cast("string"))).cast("double")
        / lit(5.76460752303423488e17) - lit(1.0)) / lit(8.0))
    var emb = freq
      .select(col("w"), explode(sequence(lit(0), lit(dim - 1))).as("j"))
      .select(col("w"), col("j"), draw("u").as("u"), draw("v").as("v"))
      .localCheckpoint(true)
    (1 to iters).foreach { _ =>
      val sc = ww
        .join(emb.select(col("w").as("c"), col("j"), col("u")), Seq("c"))
        .join(emb.select(col("w").as("x"), col("j"), col("v")),
          Seq("x", "j"))
        .groupBy("c", "x", "wgt", "sign")
        .agg(sum(col("u") * col("v")).as("s"))
      val r = graft.Caches.track(sc.select(col("c"), col("x"),
          snapCol(when(col("sign") === 1,
              col("wgt") * (lit(1.0) - sig(col("s"))))
            .otherwise(-col("wgt") * sig(col("s")))).as("r"))
        .persist(StorageLevel.MEMORY_AND_DISK))
      val gu = r
        .join(emb.select(col("w").as("x"), col("j"), col("v")), Seq("x"))
        .select(col("c").as("w"), col("j"), snapCol(col("r") * col("v")).as("t"))
        .groupBy("w", "j").agg(sum(col("t")).as("gu"))
      val gv = r
        .join(emb.select(col("w").as("c"), col("j"), col("u")), Seq("c"))
        .select(col("x").as("w"), col("j"), snapCol(col("r") * col("u")).as("t"))
        .groupBy("w", "j").agg(sum(col("t")).as("gv"))
      emb = emb
        .join(gu, Seq("w", "j"), "left")
        .join(gv, Seq("w", "j"), "left")
        .select(col("w"), col("j"),
          snapCol(col("u") + (lit(eta) * coalesce(col("gu"), lit(0.0)))
            / lit(nw)).as("u"),
          snapCol(col("v") + (lit(eta) * coalesce(col("gv"), lit(0.0)))
            / lit(nw)).as("v"))
        .localCheckpoint(true) // lineage cut per GD iteration
    }
    emb.collect() // ≤ |vocab|·dim rows — the trained model, bounded
      .map(r => (r.getString(0), r.getInt(1), r.getDouble(2),
        r.getDouble(3))).toVector
    }
    memoKey.fold(run())(k =>
      graft.Caches.memo(
        s"sgns:$k:w$window:m$minCount:d$dim:k$negK:e$eta:i$iters" +
          (if (sampled) ":sampled" else ""))(run()))
  }

  /** SGNS training inputs: vocab-trimmed window pairs (no subsample —
    * the oracle replays without the draw) and the vocabulary frequency
    * frame with its grid-snapped f^0.75 noise weight, both persisted. */
  private[graft] def sgnsInputs(df: DataFrame, idCol: String,
                                textCol: String, window: Int,
                                minCount: Long): (DataFrame, DataFrame) = {
    val pairs = graft.Caches.track(
      skipgramPairs(df, idCol, textCol, window, minCount,
          subsampleT = None)
        .persist(StorageLevel.MEMORY_AND_DISK))
    val freq = graft.Caches.track(df
      .select(explode(tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("f"))
      .withColumn("t75",
        floor(sqrt(col("f") * sqrt(col("f"))) * lit(ClfGrid)
          + lit(0.5)) / lit(ClfGrid))
      .persist(StorageLevel.MEMORY_AND_DISK))
    (pairs, freq)
  }

  /** SGNS loss table (positives ∪ EXPECTED negatives) with a
    * VOCAB-INDEPENDENT plan: the noise distribution stays a DataFrame
    * (q = t75/Σt75, the Σ a 1-row probe — the identical division the
    * old driver-side literal performed, so every weight double is
    * bit-unchanged), and the dense |centers|×|vocab| expected-negative
    * block spells as a [[SgnsNoiseFanout]]-way bucketed equi-join:
    * centers explode the bucket ids, noise words route by hash — the
    * salted dense product, a plain HashJoin, never a vocab-sized
    * `array(struct…)` literal bloating every serialized task (the r15
    * scale watch) and never an equality-free join. OpsSpec pins the
    * plan-size vocab-independence. */
  private[graft] val SgnsNoiseFanout = 8L
  private[graft] def sgnsWw(pairs: DataFrame, freq: DataFrame,
                            negK: Double): DataFrame = {
    val t75Total = freq.agg(sum(col("t75"))).head().getDouble(0) // 1-row probe
    val noiseQ = freq.select(col("w").as("x"),
      (col("t75") / lit(t75Total)).as("q"),
      pmod(xxhash64(col("w")), lit(SgnsNoiseFanout)).as("__nb"))
    val nc = pairs.groupBy(col("center")).agg(sum(col("cnt")).as("n_c"))
    pairs.select(col("center").as("c"), col("context").as("x"),
        col("cnt").cast("double").as("wgt"), lit(1).as("sign"))
      .unionByName(nc
        .select(col("center").as("c"), col("n_c"),
          explode(sequence(lit(0L), lit(SgnsNoiseFanout - 1L))).as("__nb"))
        .join(noiseQ, Seq("__nb"))
        .select(col("c"), col("x"),
          ((lit(negK) * col("n_c").cast("double")) * col("q")).as("wgt"),
          lit(-1).as("sign")))
  }

  /** SAMPLED-negative SGNS loss table — the production word2vec recipe
    * (k drawn negatives per positive, Mikolov et al. 2013 §2.2) made
    * exactly replayable: per center `floor(negK·n_c)` negatives draw
    * by md5-uniform inverse-CDF against the grid-snapped noise
    * distribution q ∝ f^0.75 (the d05 draw discipline: u =
    * hash60("neg:center:i")/2⁶⁰ · Σq, looked up in the word-ordered
    * cumulative). Deterministic, seedless, and spellable identically
    * in DuckDB — the same training loop then hash-matches an unrolled
    * replay (gate t45), while [[sgnsWw]] stays the vocab²-bounded
    * expectation variant (gate t42).
    *
    * Exactness: q snaps to the 2⁻²⁰ grid, so the word-ordered prefix
    * sums are EXACT dyadic sums (association-free — the driver's
    * sequential fold and DuckDB's ordered window build bit-identical
    * doubles); u = (h/2⁶⁰)·Σq is two IEEE ops on identical inputs.
    *
    * Scale shape: draws are Σ floor(negK·n_c) = ~negK·|pairs| rows —
    * CORPUS-sized, never vocab² (this is the variant that replaces
    * [[sgnsWw]] at web scale); the CDF is |vocab|-bounded, built once
    * on the driver (the same bound the final model collect already
    * carries) and shipped back as a LOCAL RELATION replicated over
    * 256 equi-width buckets (±1 slack; the exact [lo, hi) filter
    * decides membership), so the draw→word lookup is a broadcast
    * HASH join on the bucket id — never a range join, and the plan
    * stays vocab-independent. */
  private[graft] def sgnsWwSampled(pairs: DataFrame, freq: DataFrame,
                                   negK: Double): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    def snap(v: Double): Double =
      math.floor(v * ClfGrid + 0.5) / ClfGrid
    val t75Total = freq.agg(sum(col("t75"))).head().getDouble(0) // 1-row probe
    val terms = freq.select(col("w"), col("t75"))
      .collect() // ≤ |vocab| rows — the CDF build, same bound as the model collect
      .map(r => (r.getString(0), snap(r.getDouble(1) / t75Total)))
      .sortBy(_._1)
    var acc = 0.0
    val cdf = terms.map { case (w, q) =>
      val lo = acc; acc += q; (w, lo, acc) // exact: sums of 2^-20 multiples
    }
    val cumTotal = acc
    val B = 256L
    val exp = cdf.toSeq.flatMap { case (w, lo, hi) =>
      val blo = math.max(0L, math.floor(lo / cumTotal * B).toLong - 1)
      val bhi = math.min(B - 1, math.floor(hi / cumTotal * B).toLong + 1)
      (blo to bhi).map(b => (b, w, lo, hi))
    }.toDF("b", "x", "lo", "hi")
    val nc = pairs.groupBy(col("center")).agg(sum(col("cnt")).as("n_c"))
    val draws = nc
      .select(col("center").as("c"),
        floor(lit(negK) * col("n_c")).cast("long").as("nneg"))
      .filter(col("nneg") >= 1)
      .select(col("c"),
        explode(sequence(lit(0L), col("nneg") - 1)).as("i"))
      .withColumn("h", graft.ops.DedupOps.portableHash60(
        concat_ws(":", lit("neg"), col("c"), col("i").cast("string")))
        .cast("double"))
      .select(col("c"),
        (col("h") / lit(1152921504606846976.0) * lit(cumTotal)).as("u"),
        floor(col("h") / lit(4503599627370496.0)).cast("long").as("b"))
    val negs = draws.join(broadcast(exp), Seq("b"))
      .filter(col("u") >= col("lo")
        && (col("u") < col("hi") || col("hi") === lit(cumTotal)))
      .groupBy(col("c"), col("x"))
      .agg(count(lit(1)).cast("double").as("wgt"))
      .select(col("c"), col("x"), col("wgt"), lit(-1).as("sign"))
    pairs.select(col("center").as("c"), col("context").as("x"),
        col("cnt").cast("double").as("wgt"), lit(1).as("sign"))
      .unionByName(negs)
  }

  /** Nearest neighbors IN THE TRAINED SGNS SPACE — the probe showing
    * [[sgnsTrain]]'s in-engine embeddings are a usable similarity
    * space: for every vocabulary word, the top-`topK` other words by
    * cosine of the trained "in" vectors. Training memo-shares with the
    * t42 gate (`memoKey`); the |vocab|·dim model comes back as a LOCAL
    * RELATION (data, not expression tree — the plan stays
    * vocab-independent) and the all-words comparison is the
    * [[SgnsNoiseFanout]]-way bucketed dense self-join (a plain
    * HashJoin — no equality-free join anywhere) closed by a per-word
    * WindowGroupLimit. Cosine = dot/(√dot·√dot) over exact grid
    * values — both engines build identical doubles; output on the 6dp
    * floor grid. */
  def sgnsNeighbors(df: DataFrame, idCol: String, textCol: String,
                    window: Int = 3, minCount: Long = 2, dim: Int = 4,
                    negK: Double = 2.0, eta: Double = 0.5,
                    iters: Int = 3, topK: Int = 3,
                    memoKey: Option[String] = None,
                    sampled: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    import graft.functions.DotProduct.dotNative
    val m = sgnsMatrix(df, idCol, textCol, window, minCount, dim, negK,
      eta, iters, memoKey, sampled)
    val byWord = m.groupBy(_._1).view.mapValues(rows =>
      rows.sortBy(_._2).map(_._3)).toMap // w -> in-vector (j-ordered)
    val vecs = byWord.toSeq.sortBy(_._1)
      .map { case (w, e) => (w, e) }.toDF("w", "e")
    val other = vecs.select(col("w").as("ow"), col("e").as("oe"),
      pmod(xxhash64(col("w")), lit(SgnsNoiseFanout)).as("__nb"))
    vecs.select(col("w"), col("e"),
        explode(sequence(lit(0L), lit(SgnsNoiseFanout - 1L))).as("__nb"))
      .join(other, Seq("__nb"))
      .filter(col("ow") =!= col("w"))
      .select(col("w"), col("ow").as("neighbor"),
        (dotNative(col("e"), col("oe"))
          / (sqrt(dotNative(col("e"), col("e")))
            * sqrt(dotNative(col("oe"), col("oe"))))).as("cos"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("w")
          .orderBy(col("cos").desc, col("neighbor").asc)))
      .filter(col("rk") <= topK)
      .select(col("w"), col("rk"), round6(col("cos")).as("cos6"),
        col("neighbor"))
  }

  /** word2vec NEGATIVE-SAMPLING noise distribution — [[skipgramPairs]]'
    * other half (Mikolov et al. 2013 §2.2): negatives draw from the
    * unigram distribution raised to 3/4, `p(w) ∝ f(w)^0.75` — the
    * flattening that keeps rare words sampled often enough to train.
    * Returns the vocabulary noise table (w, f, t75, share6).
    *
    * ENGINE-PORTABLE without pow(): `f^0.75 = √(f·√f)` — √ is a
    * correctly-rounded IEEE op (pow is not), so both engines build the
    * bit-identical term double from the exact integer count; terms then
    * snap to the 2⁻²⁰ dyadic grid so the Σ over the vocabulary is
    * association-free (sums of grid multiples < 2³³ are exact — the
    * classifier-gradient argument), and the closing share divides two
    * identical doubles onto the 6dp floor grid. Scale shape: one corpus
    * scan → a |vocab| aggregate; the total is a 1-row probe. */
  def negativeSampling(df: DataFrame, textCol: String): DataFrame = {
    val freq = graft.Caches.track(df
      .select(explode(tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("f"))
      .withColumn("t75",
        floor(sqrt(col("f") * sqrt(col("f"))) * lit(1048576.0)
          + lit(0.5)) / lit(1048576.0))
      .persist(StorageLevel.MEMORY_AND_DISK))
    val tot = freq.agg(sum(col("t75"))).head().getDouble(0) // 1-row probe
    freq.select(col("w"), col("f"), col("t75"),
      round6(col("t75") / lit(tot)).as("share6"))
  }

  /** Unigram-LM tokenizer TRAINING (Kudo 2018, the SentencePiece
    * unigram model — the OTHER production tokenizer family next to
    * [[bpeTrain]]'s BPE; mixture pipelines compare both before
    * committing a vocab), as hard (Viterbi) EM with fixed `rounds`:
    *
    *  1. SEED: every ≤`maxPiece`-char substring of the corpus
    *     vocabulary, frequency-weighted; vocab = all single chars
    *     (coverage guarantee) ∪ top-`seedVocab` multi-char pieces.
    *  2. E-step: Viterbi-segment every distinct word under the current
    *     piece probabilities (max-PRODUCT dynamic program — products
    *     and comparisons only, so identical doubles give bit-identical
    *     segmentations on any engine; ties break to the LONGER last
    *     piece via struct ordering), count piece usage weighted by
    *     word frequency.
    *  3. M-step: prune pieces with zero usage (chars never prune),
    *     re-estimate p(piece) = (cnt+1)/(T+|V|) — Laplace-smoothed
    *     EXACT integer division, the engine-portability backbone: no
    *     logs, no exp, nothing transcendental anywhere in the loop.
    *
    * Returns the per-round usage table (round, piece, cnt) — the EM
    * trace a tokenizer-training run ships for audit.
    *
    * Scale shape: the DP runs DISTRIBUTED over the |vocab|-sized
    * distinct-word frame (one staged HOF fold per word — state is
    * O(word length), never corpus-sized); only the piece table
    * (≤ chars + seedVocab rows) ever reaches the driver, once per
    * round — the loadCentroids bound. The corpus is scanned once for
    * word frequencies. */
  def unigramTrain(df: DataFrame, textCol: String, maxPiece: Int = 4,
                   seedVocab: Int = 30, rounds: Int = 3): DataFrame = {
    val spark = df.sparkSession
    val (trace, _, _) = unigramLoop(df, textCol, maxPiece, seedVocab, rounds)
    import spark.implicits._
    trace.toDF("round", "piece", "cnt")
  }

  /** [[unigramTrain]] + APPLY: segment every document with the trained
    * model — each token Viterbi-splits into subword pieces, the doc
    * reassembles in token order. Returns (id, n_tokens, n_pieces,
    * seg) where `seg` is the full piece stream; fingerprint it for a
    * compact gate. The apply is ONE join from the doc tokens to the
    * |vocab|-sized word→segmentation table (computed once) — the
    * tokenizer inference shape: at 100 TB the corpus shuffles only on
    * (word), and the segmentation table broadcasts. */
  def unigramSegment(df: DataFrame, idCol: String, textCol: String,
                     maxPiece: Int = 4, seedVocab: Int = 30,
                     rounds: Int = 3): DataFrame = {
    val (_, words, pFinal) = unigramLoop(df, textCol, maxPiece,
      seedVocab, rounds)
    val seg = viterbiPieces(words, pFinal, maxPiece)
      .select(col("w"), array_join(col("__ps"), " ").as("__seg"),
        size(col("__ps")).as("__np"))
    val toks = df
      .select(col(idCol).as("id"), tokens(col(textCol)).as("__ts"))
      .select(col("id"), posexplode(col("__ts")))
      .select(col("id"), col("pos"), col("col").as("w"))
    toks.join(broadcast(seg), Seq("w"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("__np")).as("n_pieces"),
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("__seg")))),
          s => s.getField("__seg")), " ").as("seg"))
      .select(col("id").as(idCol), col("n_tokens"),
        col("n_pieces").cast("long").as("n_pieces"), col("seg"))
  }

  /** Shared EM loop: returns (per-round usage rows, the persisted
    * distinct-word frame, the final piece probabilities). Bounded
    * driver state: one ≤(chars+seedVocab)-row collect per round. */
  private def unigramLoop(df: DataFrame, textCol: String, maxPiece: Int,
                          seedVocab: Int, rounds: Int)
      : (Seq[(Int, String, Long)], DataFrame, Map[String, Double]) = {
    require(rounds >= 1 && maxPiece >= 2 && seedVocab >= 1,
      "unigramTrain needs rounds >= 1, maxPiece >= 2, seedVocab >= 1")
    val words = graft.Caches.track(df
      .select(explode(tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .persist(StorageLevel.MEMORY_AND_DISK))
    // seed substring counts (frequency-weighted, every start × length).
    // The vocab cut is PUSHED INTO THE ENGINE — only chars (≤|alphabet|
    // rows) and the top-seedVocab multi-char pieces (a
    // TakeOrderedAndProject heap, never a full sort) ever reach the
    // driver, so the collect stays bounded on any corpus: the Laplace
    // seed probabilities only ever read counts of vocab members, so
    // restricting the collected map to chars ∪ top-K is exact.
    val pieceCnt = words
      .select(col("freq"), explode(flatten(transform(
          sequence(lit(1), length(col("w"))),
          i => transform(
            sequence(lit(1), least(lit(maxPiece), length(col("w")) - i + 1)),
            l => col("w").substr(i, l))))).as("piece"))
      .groupBy("piece").agg(sum(col("freq")).as("cnt"))
    val charRows = pieceCnt.filter(length(col("piece")) === 1)
      .collect() // ≤ |alphabet| rows — every single char joins the vocab
    // engine tiebreak (cnt DESC, piece ASC in UTF8 binary order) matches
    // the driver sortBy below for all BMP text (UTF-8 byte order ==
    // UTF-16 order == code point order outside the supplementary planes);
    // the driver re-sort re-asserts the exact order on the collected set
    val multiRows = pieceCnt.filter(length(col("piece")) > 1)
      .orderBy(col("cnt").desc, col("piece").asc)
      .limit(seedVocab)
      .collect() // ≤ seedVocab rows — the heap cut
    val seeds = (charRows ++ multiRows)
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val chars = seeds.keySet.filter(_.length == 1)
    val multi = seeds.keySet.filter(_.length > 1).toSeq
      .sortBy(p => (-seeds(p), p)).take(seedVocab)
    def laplace(cnt: Map[String, Long],
                vocab: Set[String]): Map[String, Double] = {
      val t = vocab.toSeq.map(p => cnt.getOrElse(p, 0L)).sum
      val n = vocab.size
      vocab.iterator.map(p =>
        p -> (cnt.getOrElse(p, 0L) + 1.0) / (t + n)).toMap
    }
    var vocab = chars ++ multi
    var p = laplace(seeds, vocab)
    val trace = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, Long)]
    (1 to rounds).foreach { r =>
      val cnt = viterbiPieces(words, p, maxPiece)
        .select(col("freq"), explode(col("__ps")).as("piece"))
        .groupBy("piece").agg(sum(col("freq")).as("cnt"))
        .collect() // ≤ |vocab| rows — the loadCentroids bound
        .map(x => x.getString(0) -> x.getLong(1)).toMap
      trace ++= cnt.toSeq.sortBy { case (pc, c) => (-c, pc) }
        .map { case (pc, c) => (r, pc, c) }
      vocab = chars ++ vocab.filter(q => cnt.getOrElse(q, 0L) >= 1)
      p = laplace(cnt, vocab)
    }
    (trace.toSeq, words, p)
  }

  /** Viterbi segmentation of the distinct-word frame under piece
    * probabilities `p` (a bounded driver map, shipped as a literal):
    * max-product DP as ONE staged HOF fold per word (best[i] = max over
    * piece lengths of best[i−l]·p(w[i−l..i]), ties to the longer piece
    * via struct ordering), then a second fold walks the backpointers
    * into the piece list. Adds `__ps` (array of pieces). */
  private def viterbiPieces(words: DataFrame, p: Map[String, Double],
                            maxPiece: Int): DataFrame = {
    val pm = map(p.toSeq.sortBy(_._1)
      .flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
    def dpStep(acc: Column, i: Column): Column = {
      val cands = (1 to maxPiece).map { l =>
        val piece = col("w").substr(i - (l - 1), lit(l))
        val pv = element_at(pm, piece)
        when(i >= l && pv.isNotNull,
          struct((element_at(acc, i - (l - 1)).getField("s") * pv).as("s"),
            lit(l).as("bl")))
          .otherwise(struct(lit(-1.0).as("s"), lit(0).as("bl")))
      }
      concat(acc, array(greatest(cands: _*)))
    }
    val wkInit = struct(length(col("w")).as("pos"),
      array().cast("array<string>").as("arr"))
    def wkStep(acc: Column, i: Column): Column = {
      val pos = acc.getField("pos")
      val bl = element_at(col("__dp"), pos + 1).getField("bl")
      when(pos > 0, struct((pos - bl).as("pos"),
        concat(array(col("w").substr(pos - bl + 1, bl)),
          acc.getField("arr")).as("arr")))
        .otherwise(acc)
    }
    words
      .select(col("w"), col("freq"),
        aggregate(sequence(lit(1), length(col("w"))),
          array(struct(lit(1.0).as("s"), lit(0).as("bl"))),
          dpStep).as("__dp"))
      .select(col("w"), col("freq"),
        aggregate(sequence(lit(1), length(col("w"))), wkInit, wkStep)
          .getField("arr").as("__ps"))
  }

  /** Side-by-side tokenizer DATASHEET — BPE vs unigram-LM trained on
    * the SAME corpus (the comparison a mixture pipeline runs before
    * committing a vocab): per tokenizer, the number of distinct
    * subword units actually USED by the segmented corpus, the total
    * frequency-weighted piece count, and the compression ratio
    * chars/piece (higher = fewer, longer pieces). Both trainings reuse
    * the shared loops ([[bpeTrain]]'s merge loop, [[unigramTrain]]'s
    * EM); the closing statistics are two 1-row aggregate probes per
    * tokenizer (bounded driver state), assembled driver-side. All
    * inputs to the ratio are exact integers, so the one division is
    * engine-identical. */
  def tokenizerCompare(df: DataFrame, textCol: String, merges: Int = 8,
                       maxPiece: Int = 4, seedVocab: Int = 30,
                       rounds: Int = 3): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val (_, vFinal) = bpeLoop(df, textCol, merges)
    val bpeSt = vFinal.select(split(col("s"), " ").as("ps"), col("freq"),
      length(translate(col("s"), " |", "")).cast("long").as("wlen"))
    val (_, words, pFinal) =
      unigramLoop(df, textCol, maxPiece, seedVocab, rounds)
    val uniSt = viterbiPieces(words, pFinal, maxPiece)
      .select(col("__ps").as("ps"), col("freq"),
        length(col("w")).cast("long").as("wlen"))
    def stats(st: DataFrame, norm: Column => Column): (Long, Long, Long) = {
      val a = st.agg(
        sum(col("freq") * size(col("ps")).cast("long")).as("pt"),
        sum(col("freq") * col("wlen")).as("ct")).head() // 1-row probe
      val v = st.select(explode(col("ps")).as("t"))
        .agg(count_distinct(norm(col("t"))).as("vu")).head() // 1-row probe
      (v.getLong(0), a.getLong(0), a.getLong(1))
    }
    val (bv, bp, bc) = stats(bpeSt, t => trim(t, "|"))
    val (uv, up, uc) = stats(uniSt, identity)
    Seq(("bpe", bv, bp, bc.toDouble / bp.toDouble),
        ("unigram", uv, up, uc.toDouble / up.toDouble))
      .toDF("tokenizer", "vocab_used", "pieces_total", "chars_per_piece")
  }

  /** Engine-portable 6-dp rounding for NON-NEGATIVE doubles:
    * floor(x·1e6 + 0.5)/1e6. `round()` implementations disagree on
    * half-way doubles (Spark rounds the shortest decimal rendering via
    * BigDecimal, DuckDB rounds the binary value — observed 1-ulp output
    * divergence on the sf0.1 fixture), while floor of the identical
    * product double is bit-deterministic across engines. Half-up toward
    * +∞, so only use for values known ≥ 0. */
  def round6(c: Column): Column = floor(c * lit(1e6) + lit(0.5)) / lit(1e6)

  /** 2dp sibling of [[round6]] — for cross-engine compares where the two
    * engines' aggregation ASSOCIATION differs (e.g. DuckDB's windowed
    * sums run over a segment tree, Spark's run linearly — last-ulp drift
    * that a 1e-6 grid can straddle; observed: s59 at sf0.01). */
  def round2(c: Column): Column = floor(c * lit(1e2) + lit(0.5)) / lit(1e2)

  /** Composite quality score in [0,1]: length prior × (1 − stopword excess).
    * Heuristic, deterministic, fully expression-based. */
  def qualityScore(text: Column): Column = {
    val lenPrior = least(length(text).cast("double") / lit(500.0), lit(1.0))
    val stopPenalty = greatest(lit(0.0), lit(1.0) - stopwordRatio(text) * 2.0)
    round6(lenPrior * stopPenalty)
  }

  /** Language-ID in two stages — the classic cheap detector:
    *
    * 1. SCRIPT stage: Unicode code-point RANGE counts decide
    *    script-distinct languages (CJK → zh, kana → ja, Hangul → ko,
    *    Cyrillic → ru, Arabic → ar, Greek → el, Hebrew → he,
    *    Devanagari → hi, Thai → th). A script claims the document when
    *    it covers ≥ 5 % of its characters (count·20 ≥ length — one stray
    *    char never flips the call); kana outranks Han (Japanese text
    *    carries Han too), then the remaining scripts in a fixed order.
    *    Pure per-row regex counts, engine-portable (both engines see the
    *    same code points), guarded by ONE any-non-Latin-1 probe so a
    *    pure-ASCII row (the dominant crawl case) pays a single regex.
    * 2. Latin fallback: marker-stopword counts for en/es/de/fr with the
    *    deterministic en ≥ es ≥ de ≥ fr tie order (the original
    *    heuristic — script counts are all zero on Latin text).
    *
    * Before the script stage, every CJK document was mislabeled into a
    * Latin class (t28 measured zh recall 0 — the round-12 blind spot). */
  def langId(text: Column): Column = {
    val (script, latin, _) = langIdStages(text)
    coalesce(script, latin)
  }

  /** [[langId]] with a routing-grade `und` class: a document NO script
    * claims and NO Latin marker occurs in gets `und` (undetermined)
    * instead of tie-defaulting to `en` — the quarantine routing a real
    * mixture pipeline needs (an en-defaulted zero-signal doc silently
    * pollutes the English mixture weight; an `und` doc routes to a
    * heavier detector or is dropped by policy). Same two stages, same
    * tie order for any row with signal. */
  def langIdRouted(text: Column): Column = {
    val (script, latin, total) = langIdStages(text)
    coalesce(script, when(total === 0, lit("und")).otherwise(latin))
  }

  /** Shared internals of [[langId]]/[[langIdRouted]]: (script-stage
    * pick or null, Latin-stage pick, total Latin marker count). */
  private def langIdStages(text: Column)
      : (Column, Column, Column) = {
    def sc(lo: String, hi: String): Column =
      regexp_count(text, lit(s"[$lo-$hi]"))
    val n = length(text)
    def claims(c: Column): Column = c > 0 && c * 20 >= n
    val script =
      when(text.rlike("[^\\x00-\\xFF]"),
        when(claims(sc("\u3040", "\u30FF")), lit("ja"))
          .when(claims(sc("\u4E00", "\u9FFF")), lit("zh"))
          .when(claims(sc("\uAC00", "\uD7A3")), lit("ko"))
          .when(claims(sc("\u0400", "\u04FF")), lit("ru"))
          .when(claims(sc("\u0600", "\u06FF")), lit("ar"))
          .when(claims(sc("\u0370", "\u03FF")), lit("el"))
          .when(claims(sc("\u0590", "\u05FF")), lit("he"))
          .when(claims(sc("\u0900", "\u097F")), lit("hi"))
          .when(claims(sc("\u0E00", "\u0E7F")), lit("th")))
    val ts = tokens(text)
    def score(markers: Seq[String]): Column =
      size(filter(ts, t => t.isin(markers: _*)))
    val en = score(Seq("the", "and", "of", "is"))
    val es = score(Seq("el", "la", "los", "de", "que"))
    val de = score(Seq("der", "die", "und", "das", "ist"))
    val fr = score(Seq("le", "les", "et", "est", "une"))
    val latin =
      when(en >= es && en >= de && en >= fr, lit("en"))
        .when(es >= de && es >= fr, lit("es"))
        .when(de >= fr, lit("de"))
        .otherwise(lit("fr"))
    (script, latin, en + es + de + fr)
  }

  /** Content fingerprint: md5 of whitespace-normalized lowercased text.
    * Engine-portable (DuckDB md5 produces the same hex). */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(trim(lower(text)), " +", " "))

  /** Word n-gram shingles (n consecutive tokens joined by a space),
    * distinct. The unit of near-dup detection in [[DedupOps]]. */
  def shingles(text: Column, n: Int): Column = shinglesOfTokens(tokens(text), n)

  /** Word n-grams of a token array via shifted zip_with joins.
    *
    * PERF: the obvious `transform(indices, i => array_join(slice(ts, i+1,
    * n)))` re-evaluates the token subtree PER ELEMENT (lambda-captured
    * subtrees are trees, not DAGs) — ~|tokens| tokenizations per row,
    * measured 2ms/row. Shifted zip_with evaluates the token array a
    * constant ~n times: zip the array with its 1..n-1 shifts, concatenating
    * elements; unequal lengths pad with null and concat propagates null, so
    * trailing partial grams drop in one filter (also covers docs shorter
    * than n tokens). */
  def shinglesOfTokens(ts: Column, n: Int): Column = {
    require(n >= 2, "shingle size must be >= 2")
    array_distinct(ngramsOfTokens(ts, n))
  }

  /** Word n-grams of a token array WITH multiplicity, in document order —
    * the repetition-signal unit ([[shinglesOfTokens]] is the distinct
    * variant). Same shifted zip_with construction (see PERF note there). */
  def ngramsOfTokens(ts: Column, n: Int): Column = {
    require(n >= 2, "n-gram size must be >= 2")
    val joined = (2 to n).foldLeft(ts) { (acc, i) =>
      zip_with(acc, slice(ts, lit(i), greatest(size(ts) - i + 1, lit(0))),
        (a, b) => concat(a, lit(" "), b)) // concat propagates null (concat_ws would skip it)
    }
    filter(joined, g => g.isNotNull)
  }

  /** Duplicate n-gram fraction: 1 − distinct/total n-grams (0 when the doc
    * has no n-grams). The Gopher-style within-document repetition signal —
    * high values mean boilerplate/looping text. Pure per-row expression. */
  def dupNgramFraction(text: Column, n: Int): Column = {
    val gs = ngramsOfTokens(tokens(text), n)
    when(size(gs) === 0, lit(0.0))
      .otherwise(lit(1.0) -
        size(array_distinct(gs)).cast("double") / size(gs).cast("double"))
  }

  /** Top n-gram coverage per document: the fraction of the doc's n-grams
    * claimed by its single most-repeated n-gram — the other half of the
    * Gopher repetition family ([[dupNgramFraction]] sees how much of the
    * doc repeats AT ALL; this sees how much one loop dominates — the
    * "same boilerplate sentence 400 times" failure mode that a diffuse
    * duplicate fraction understates). Docs with fewer than n tokens have
    * no n-grams and drop.
    *
    * Scale shape: the n-gram array is STAGED in a Project before the
    * explode (Generate evaluates its generator input
    * interpreted), then two keyed
    * partial+final aggregates — (doc, gram) counts, per-doc close. Both
    * shuffles key by doc_id; nothing is corpus-global. Ratios ride
    * [[round6]]'s engine-portable floor grid. */
  def topNgramShare(df: DataFrame, idCol: String, textCol: String,
                    n: Int): DataFrame = {
    val staged = df.select(col(idCol),
      ngramsOfTokens(tokens(col(textCol)), n).as("__gs"))
    staged.select(col(idCol), explode(col("__gs")).as("g"))
      .groupBy(idCol, "g").agg(count(lit(1)).as("c"))
      .groupBy(idCol).agg(
        sum(col("c")).as("n_grams"),
        max(col("c")).as("top_cnt"))
      .select(col(idCol), col("n_grams"), col("top_cnt"),
        round6(col("top_cnt").cast("double")
          / col("n_grams").cast("double")).as("top_share6"))
  }

  /** RAG-style sliding-window token chunker: split each document into
    * chunks of `size` tokens with `overlap` tokens shared between
    * consecutive chunks (stride = size − overlap). The last chunk may be
    * shorter; a chunk fully contained in its predecessor is never emitted
    * (chunk count = 1 + ⌈(n − size)/stride⌉ for n > size, else 1 — the
    * LangChain/llama-index splitter convention). Output one row per chunk:
    * (id, chunk_id, chunk, n_tokens).
    *
    * Scale shape: the token array is STAGED in a Project before the
    * Generate (Generate evaluates its generator input interpreted —
    * staging keeps the tokenizer codegen'd and run-once), the chunk-id
    * sequence is derived from the staged array's
    * size (cheap on the materialized array), and the slice/join runs
    * per-partition — zero shuffles, row count grows by ~n/stride. */
  def chunkTokens(docs: DataFrame, idCol: String, textCol: String,
                  chunkSize: Int, overlap: Int): DataFrame = {
    require(chunkSize >= 1, "chunk size must be >= 1")
    require(overlap >= 0 && overlap < chunkSize,
      "overlap must be in [0, chunkSize)")
    val stride = chunkSize - overlap
    val staged = docs.select(col(idCol), tokens(col(textCol)).as("__ws"))
    val n = size(col("__ws"))
    val nchunks = when(n <= chunkSize, lit(1L)).otherwise(
      ceil((n - lit(chunkSize)).cast("double") / lit(stride.toDouble))
        .cast("long") + 1L)
    val start = (col("__chunk_id") * stride + 1).cast("int")
    staged
      .select(col(idCol), col("__ws"),
        explode(sequence(lit(0L), nchunks - 1L)).as("__chunk_id"))
      .select(col(idCol), col("__chunk_id").as("chunk_id"),
        array_join(slice(col("__ws"), start, lit(chunkSize)), " ")
          .as("chunk"),
        least(lit(chunkSize.toLong), size(col("__ws")).cast("long")
          - col("__chunk_id") * stride).as("n_tokens"))
  }

  /** PII redaction for training corpora: emails, then IPv4s, then
    * phone-shaped digit runs, each replaced with a typed placeholder
    * (order matters — the phone pattern would otherwise eat IPs). Pure
    * codegen'd regexp_replace chain over one scan; explicit character
    * classes only, so the Java and RE2-family (DuckDB) engines agree
    * byte-for-byte — cross-engine equality is what the t09 gate hashes. */
  def redactPii(text: Column): Column = {
    val email = regexp_replace(text,
      "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z][a-zA-Z]+", "<EMAIL>")
    val ip = regexp_replace(email,
      "([0-9]{1,3}\\.){3}[0-9]{1,3}", "<IP>")
    regexp_replace(ip,
      "\\+?[0-9][0-9()\\[\\] .-]{7,}[0-9]", "<PHONE>")
  }

  /** CCNet-style language-model quality score: train an add-k-smoothed
    * bigram LM on the corpus itself, then score every document by its mean
    * token log-probability — the perplexity-filtering signal used to rank
    * web text against a reference distribution (here the corpus is its own
    * reference; in production the count tables would come from a curated
    * corpus and be a plain DataFrame input).
    *
    * P(w2|w1) = (C(w1 w2) + k) / (C(w1) + k·V), V = vocabulary size.
    * Output: (id, n_bg, avg_logp) — one row per input doc; docs with < 2
    * tokens have n_bg = 0 and null score.
    *
    * Scale shape: the LM IS a DataFrame — bigram counts from one
    * partial+final aggregation keyed by bigram, unigram counts likewise;
    * scoring joins the exploded corpus back on those same natural keys
    * (AQE broadcasts the count tables when a pruned LM fits, shuffles
    * otherwise). The only driver state is V, a single long. The token
    * explode is staged in a Project before Generate and persisted once to
    * feed the bigram, unigram, and scoring branches (tracked in
    * [[graft.Caches]]). avg() is partial+final; callers round the
    * parallel-summed double before hash comparison. */
  def lmScore(df: DataFrame, idCol: String, textCol: String,
              addK: Double = 0.5): DataFrame = {
    require(addK > 0, "addK must be > 0 (unsmoothed zeros make log diverge)")
    val bg = graft.Caches.track(df
      .select(col(idCol), tokens(col(textCol)).as("__ts"))
      .select(col(idCol), explode(ngramsOfTokens(col("__ts"), 2)).as("g"))
      .select(col(idCol), col("g"),
        element_at(split(col("g"), " "), 1).as("w1"))
      .persist(StorageLevel.MEMORY_AND_DISK))
    val bgCounts = bg.groupBy("g").agg(count(lit(1)).as("cbg"))
    val uniCounts = df
      .select(explode(tokens(col(textCol))).as("w1"))
      .groupBy("w1").agg(count(lit(1)).as("cw"))
    val vocab = uniCounts.count() // scalar: |V|, bounded driver state
    val scored = bg
      .join(bgCounts, "g")
      .join(uniCounts, "w1")
      .select(col(idCol),
        log((col("cbg").cast("double") + lit(addK)) /
          (col("cw").cast("double") + lit(addK * vocab))).as("lp"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bg"), avg("lp").as("avg_logp"))
    df.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bg"), lit(0L)).as("n_bg"), col("avg_logp"))
  }

  /** Unicode-normalize the text (NFC/NFD/NFKC/NFKD) via the codegen'd
    * [[graft.functions.UnicodeNormalize]] expression — canonicalize
    * BEFORE any hashing/dedup/tokenize step (decomposed accents and
    * ligatures otherwise split duplicate groups). */
  def normalizeText(text: Column, form: String = "NFC"): Column =
    graft.functions.UnicodeNormalize.normalize(text, form)

  /** Strip C0/C1 control characters (except \t \n \r) — explicit
    * byte-range classes so Java and RE2-family engines agree. */
  def stripControl(text: Column): Column =
    regexp_replace(text,
      "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]", "")

  /** Sentence segmentation (punctuation-based): split on runs of
    * sentence-final punctuation plus trailing whitespace, trim, drop
    * empties. Engine-portable (no lookbehind — RE2 lacks it), so the
    * whole explode is DuckDB-oracleable. Returns the sentence ARRAY;
    * fan out with posexplode in the caller. */
  def sentences(text: Column): Column =
    filter(transform(split(text, "[.!?]+\\s*"), s => trim(s)),
      s => s =!= "")

  /** BPE merge-step statistics — the distributed core of byte-pair-encoding
    * tokenizer training: corpus-weighted counts of adjacent symbol pairs
    * (symbols = characters at initialization), top `topK` candidates by
    * count with a deterministic (count desc, pair asc) tiebreak.
    *
    * Scale shape: ONE corpus tokenize+explode feeds a partial+final word
    * count, and the character-pair walk then runs over the DISTINCT
    * vocabulary only (each word's pairs weighted by its corpus frequency) —
    * the standard BPE factorization: pair work is |vocab|-bounded, never
    * corpus-bounded, so 100 TB of text costs one word-count aggregation
    * plus a vocabulary-sized explode. Top-k plans as
    * TakeOrderedAndProject (per-partition heaps, no global sort). */
  def bpePairStats(df: DataFrame, textCol: String, topK: Int): DataFrame = {
    require(topK >= 1, "topK must be >= 1")
    val words = df.select(explode(tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
    words
      .filter(length(col("w")) >= 2)
      .select(col("w"), col("freq"),
        explode(sequence(lit(1), length(col("w")) - 1)).as("i"))
      .select(col("w").substr(col("i"), lit(2)).as("pair"), col("freq"))
      .groupBy("pair").agg(sum(col("freq")).as("cnt"))
      .orderBy(col("cnt").desc, col("pair").asc)
      .limit(topK)
  }

  /** Zipf rank–frequency table with the fitted log-log slope: every
    * token with `freq ≥ minCount`, its global frequency rank (1 = most
    * frequent, ties broken by token text), and the least-squares slope
    * of ln(freq) on ln(rank) — Zipf's law predicts ≈ −1 on natural
    * text; large deviations flag synthetic/boilerplate corpora (a
    * datasheet staple).
    *
    * Rank is NEVER a single-task global window: per-frequency counts
    * run through the range-bucket distributed cumsum
    * ([[graft.core.GlobalWindows]]) for the "tokens strictly more
    * frequent" prefix, and a freq-KEYED row_number breaks ties — both
    * shuffles are vocabulary-sized. The regression reduces per-token
    * ln-terms snapped to exact 1e-6-unit longs (order-free integer
    * sums; the e37 discipline), closed by one 1-row driver probe, so
    * the slope is bit-deterministic across engines. */
  def zipfFit(df: DataFrame, textCol: String, minCount: Long): DataFrame = {
    val vocab = graft.Caches.track(
      df.select(explode(tokens(col(textCol))).as("t"))
        .groupBy("t").agg(count(lit(1)).as("freq"))
        .filter(col("freq") >= minCount)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val fc = vocab.groupBy("freq").agg(count(lit(1)).as("cnt"))
    val ser = graft.core.Series.fromExpr(fc, col("cnt"), "cnt",
      -col("freq"), "nf")
    val gw = ser.globalWindows()
    val pre = gw.result("cnt" -> gw.value, "cum" -> gw.cumsum())
      .select((-col("nf")).as("freq"), (col("cum") - col("cnt")).as("higher"))
    val wTie = org.apache.spark.sql.expressions.Window
      .partitionBy("freq").orderBy(col("t").asc)
    // ranked feeds the regression probe AND the returned frame — persist
    // so the join + window machinery runs once per invocation
    val ranked = graft.Caches.track(vocab.join(pre, "freq")
      .withColumn("rank", col("higher") + row_number().over(wTie))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val x = log(col("rank").cast("double"))
    val y = log(col("freq").cast("double"))
    // Accepted ulp exposure (here and in pmiBigrams' round6(log(...))):
    // ln() of an exact integer is irrational for rank/freq > 1, so its
    // double never sits ON a grid boundary by construction — but the two
    // engines' libm log() may differ by 1 ulp, flipping the floor only
    // when the true value lies within ~1 ulp of a boundary
    // (probability ≈ 2⁻³² per term; a single flip moves one micro-unit
    // in an order-free BIGINT sum). Unlike the s58/s59 money-mean case
    // the values are pseudo-uniform mod the grid, so an off-grid shift
    // constant cannot reduce the exposure — it only relocates it.
    def u6(c: Column): Column = floor(c * lit(1e6) + lit(0.5)).cast("long")
    val a = ranked.agg(count(lit(1)).as("n"), sum(u6(x)).as("sx"),
      sum(u6(y)).as("sy"), sum(u6(x * y)).as("sxy"),
      sum(u6(x * x)).as("sxx")).head()
    val n = a.getLong(0).toDouble
    val sx = a.getLong(1).toDouble / 1e6
    val sy = a.getLong(2).toDouble / 1e6
    val sxy = a.getLong(3).toDouble / 1e6
    val sxx = a.getLong(4).toDouble / 1e6
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val slope6 = math.floor(slope * 1e6 + 0.5) / 1e6
    ranked.select(col("t").as("token"), col("freq"), col("rank"),
      lit(slope6).as("slope6"))
  }

  /** Bigram PMI collocations: the corpus's most-associated adjacent word
    * pairs, `pmi = ln(p(xy) / (p(x)·p(y)))` with `p(xy) = c(xy)/N_bigrams`
    * and `p(x) = c(x)/N_tokens` — the classic collocation-extraction /
    * phrase-mining statistic (Church & Hanks 1990), the signal a tokenizer
    * or phrase-vocabulary build wants from a training corpus.
    *
    * Plan shape for 100 TB: the token array stages in ONE Project (and the
    * frame persists so tokenization runs once for the bigram AND unigram
    * branches), then two explode → partial+final count aggregations — the
    * shuffles carry one row per (gram, partition), never per token. The
    * corpus totals are a single 1-row driver probe; the two unigram joins
    * are vocabulary-sized equi-joins (broadcast at small vocab, keyed
    * otherwise). Top-k plans as TakeOrderedAndProject heaps.
    *
    * PMI is computed as `ln(lift)` with lift spelled in a FIXED
    * association — `((cxy·Nt)·Nt) / ((Nb·cx)·cy)` — so an external engine
    * replaying the integer counts lands on the bit-identical double; the
    * 6dp floor grid then absorbs any libm ln() tail. Ordering is on the
    * ROUNDED pmi (ulp ties would otherwise order differently across
    * engines), tie-broken by the gram text. */
  def pmiBigrams(df: DataFrame, textCol: String, minCount: Long,
                 topK: Int): DataFrame = {
    require(topK >= 1, "topK must be >= 1")
    val ta = graft.Caches.track(
      df.select(tokens(col(textCol)).as("__ts"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // corpus totals: 1-row aggregate (CollectLintSpec-documented bound)
    val tot = ta.agg(
      sum(size(col("__ts"))).as("nt"),
      sum(greatest(size(col("__ts")) - 1, lit(0))).as("nb")).head()
    val nt = tot.getLong(0).toDouble
    val nb = tot.getLong(1).toDouble
    val pairs = ta
      .select(ngramsOfTokens(col("__ts"), 2).as("__gs"))
      .select(explode(col("__gs")).as("g"))
      .groupBy("g").agg(count(lit(1)).as("cxy"))
      .filter(col("cxy") >= minCount)
      .withColumn("w1", split(col("g"), " ").getItem(0))
      .withColumn("w2", split(col("g"), " ").getItem(1))
    // the unigram aggregate feeds TWO joins (cx and cy) — persist so the
    // corpus-wide explode+count runs once (released by Caches.clear())
    val uni = graft.Caches.track(
      ta.select(explode(col("__ts")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("c"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val lift = (col("cxy").cast("double") * lit(nt) * lit(nt)) /
      (lit(nb) * col("cx") * col("cy"))
    pairs
      .join(uni.select(col("w").as("w1"), col("c").as("cx")), "w1")
      .join(uni.select(col("w").as("w2"), col("c").as("cy")), "w2")
      .select(col("g"), col("cxy"), col("cx"), col("cy"),
        round6(log(lift)).as("pmi"))
      .orderBy(col("pmi").desc, col("g").asc)
      .limit(topK)
  }
}
