package graft

import org.apache.spark.sql.functions._
import graft.ops.TextOps
import graft.functions.ShingleHashes.shingleHashes

/** Temporary profiling main — not part of the shipped surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = Sessions.local("32", "graft-scratch")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[scratch] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    val docs = Tables.documents(spark, d)
    docs.count() // warm
    // bit-identity: hash of declarative path == native expression, all docs
    val mismatch = docs
      .select(col("doc_id"),
        transform(TextOps.shingles(col("text"), 3), s => xxhash64(s)).as("a"),
        shingleHashes(col("text"), 3).as("b"))
      .filter(not(col("a") <=> col("b")))
      .count()
    println(s"[scratch] bit-identity mismatches = $mismatch")
    for (pass <- 1 to 2) {
      println(s"--- pass $pass ---")
      time("declarative_postings") {
        docs.select(col("doc_id"), TextOps.shingles(col("text"), 3).as("__shs"))
          .select(col("doc_id"), explode(col("__shs")).as("sh")).count()
      }
      time("native_postings") {
        docs.select(col("doc_id"), shingleHashes(col("text"), 3).as("__shs"))
          .select(col("doc_id"), explode(col("__shs")).as("sh")).count()
      }
    }
    spark.stop()
  }
}
