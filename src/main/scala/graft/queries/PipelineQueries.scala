package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.{PipelineOps, TextOps}

/** Dataset-assembly queries: deterministic splits and token-budget shard
  * packing over the `documents` fixture, each with a DuckDB oracle (both
  * ops are engine-portable by construction — md5 prefix ranges and prefix
  * sums).
  */
object PipelineQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Deterministic 80/10/10 split by md5(doc_id) hex prefix: per-row, no
    // shuffle, stable under corpus growth and engine migration.
    "p01_hash_split" -> ((s, d) =>
      PipelineOps.hashSplit(Tables.documents(s, d), "doc_id",
          Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)))
        .select("doc_id", "split")
        .orderBy("doc_id")),

    // Token-budget shard packing: shard = floor(exclusive-prefix-sum /
    // 2000) in doc_id order, prefix sum computed by the two-pass
    // distributed form (no single-task global window).
    "p02_pack_shards" -> ((s, d) =>
      PipelineOps.packShards(
          Tables.documents(s, d)
            .select(col("doc_id"),
              TextOps.tokenCount(col("text")).as("n_tokens")),
          "doc_id", "n_tokens", budget = 2000L)
        .select("doc_id", "n_tokens", "shard")
        .orderBy("doc_id")),

    // Deterministic stratified sample: 5 docs per source by md5 draw.
    "p03_stratified_sample" -> ((s, d) =>
      PipelineOps.stratifiedTopK(Tables.documents(s, d), "doc_id",
          "source", k = 5)
        .select("doc_id", "source")
        .orderBy("doc_id")),

    // Domain-mixture reweighting: per-source keep rates (100%/75%/50%/25%,
    // 10% default), decided per-row by a salted md5 draw.
    "p04_source_mixture" -> ((s, d) =>
      PipelineOps.mixtureSample(Tables.documents(s, d), "doc_id", "source",
          Map("src0" -> 1.0, "src1" -> 0.75, "src2" -> 0.5, "src3" -> 0.25),
          defaultRate = 0.1)
        .select("doc_id", "source")
        .orderBy("doc_id")),

    // Corpus report card: the per-source rollup a dataset release ships
    // with — doc counts, token volume, mean quality, language spread. ONE
    // partial+final aggregate keyed by source; the per-doc metrics are
    // pure expressions inside the partial side, so no second scan.
    "p05_corpus_report" -> ((s, d) =>
      Tables.documents(s, d).groupBy("source").agg(
          count(lit(1)).as("n_docs"),
          sum(TextOps.tokenCount(col("text"))).as("n_tokens"),
          TextOps.round6(avg(TextOps.qualityScore(col("text"))))
            .as("mean_quality"),
          countDistinct(col("lang")).as("n_langs"))
        .orderBy("source"))
  )

  private val Toks = "list_filter(string_split(lower(text), ' '), t -> t <> '')"

  val oracles: Map[String, String] = Map(
    // thresholds: 0.8*65536 = 52428 = 0xcccc, 0.9*65536 = 58982 = 0xe666;
    // fixed-width lowercase hex compares lexicographically = numerically.
    "p01_hash_split" ->
      """SELECT doc_id, CASE
           WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'cccc' THEN 'train'
           WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'e666' THEN 'val'
           ELSE 'test' END AS split
         FROM documents ORDER BY doc_id""",
    "p02_pack_shards" ->
      s"""WITH t AS (SELECT doc_id, CAST(len($Toks) AS INTEGER) AS n_tokens
                     FROM documents),
         c AS (SELECT doc_id, n_tokens,
             coalesce(sum(n_tokens) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS st
           FROM t)
         SELECT doc_id, n_tokens,
           CAST(floor(st / 2000.0) AS BIGINT) AS shard
         FROM c ORDER BY doc_id""",
    "p03_stratified_sample" ->
      """SELECT doc_id, source FROM documents
         QUALIFY row_number() OVER (PARTITION BY source
           ORDER BY substr(md5('strat' || CAST(doc_id AS VARCHAR)), 1, 4),
             doc_id) <= 5
         ORDER BY doc_id""",
    // thresholds: 0.75*65536 = 49152 = 0xc000, 0.5 = 0x8000, 0.25 = 0x4000,
    // 0.1 → 6553 = 0x1999; rate 1.0 keeps everything including 'ffff'.
    "p04_source_mixture" ->
      """WITH h AS (SELECT doc_id, source,
             substr(md5('mix' || CAST(doc_id AS VARCHAR)), 1, 4) AS hx
           FROM documents)
         SELECT doc_id, source FROM h
         WHERE CASE source
           WHEN 'src0' THEN TRUE
           WHEN 'src1' THEN hx < 'c000'
           WHEN 'src2' THEN hx < '8000'
           WHEN 'src3' THEN hx < '4000'
           ELSE hx < '1999' END
         ORDER BY doc_id""",
    // quality formula mirrors t02's oracle (incl. its per-doc 6dp round)
    "p05_corpus_report" ->
      s"""WITH t AS (SELECT source, lang, text, $Toks AS ts FROM documents),
         q AS (SELECT source, lang, len(ts) AS ntok,
             floor(least(length(text) / 500.0, 1.0) * greatest(0.0,
               1.0 - (CASE WHEN len(ts) = 0 THEN 0.0 ELSE
                 len(list_filter(ts, x -> x IN ('the','a','an','of','and',
                   'to','in','is','on','for','with'))) * 1.0 / len(ts) END)
                 * 2.0) * 1e6 + 0.5) / 1e6 AS qual
           FROM t)
         SELECT source, count(*) AS n_docs,
           CAST(sum(ntok) AS BIGINT) AS n_tokens,
           floor(avg(qual) * 1e6 + 0.5) / 1e6 AS mean_quality,
           count(DISTINCT lang) AS n_langs
         FROM q GROUP BY source ORDER BY source"""
  )
}
