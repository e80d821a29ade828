package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.ShingleHashes.shingleHashes
import graft.ops.TextOps

/** Specs for the native codegen'd ShingleHashes expression: the compiled
  * tokenize→n-gram→xxhash64→distinct pass must be bit-identical to the
  * declarative `transform(shingles(text, n), xxhash64)` path it replaces
  * inside the dedup/contamination operators. */
class ShingleHashesSpec extends AnyFunSuite with SparkFixture {

  import spark.implicits._

  private def declarative(c: org.apache.spark.sql.Column, n: Int) =
    transform(TextOps.shingles(c, n), s => xxhash64(s))

  test("bit-identical to the declarative shingle+hash path on fixture docs") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    for (n <- Seq(2, 3, 5)) {
      val mismatches = docs
        .select(declarative(col("text"), n).as("a"),
          shingleHashes(col("text"), n).as("b"))
        .filter(not(col("a") <=> col("b")))
        .count()
      assert(mismatches == 0L, s"n=$n")
    }
  }

  test("edge cases: nulls, empties, runs of spaces, short docs, repeats") {
    val d = Seq(
      Option.empty[String],        // null text -> null
      Some(""),                    // no tokens -> empty
      Some("   "),                 // spaces only -> empty
      Some("one"),                 // shorter than n -> empty
      Some("one two"),             // exactly one 2-gram short of n=3
      Some("  A  lot   OF spaces  here "), // run-of-space splits + lowering
      Some("a b a b a b")          // repeated grams -> distinct keeps first
    ).toDF("text")
    val rows = d
      .select(declarative(col("text"), 3).as("a"),
        shingleHashes(col("text"), 3).as("b"))
      .collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1))
      if (!r.isNullAt(0)) assert(r.getSeq[Long](0) == r.getSeq[Long](1))
    }
    // repeated-gram doc: 4 grams with multiplicity, 2 distinct
    assert(rows.last.getSeq[Long](1).length == 2)
  }

  test("registered in the SQL function registry") {
    val n = Tables.documents(spark, "/root/testdata/sf0.001").limit(10)
      .createOrReplaceTempView("__shdocs")
    val out = spark.sql(
      "SELECT size(graft_shingle_hashes(text, 3)) AS k FROM __shdocs")
      .collect()
    assert(out.forall(!_.isNullAt(0)))
  }
}
