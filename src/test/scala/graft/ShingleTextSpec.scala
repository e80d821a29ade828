package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.ShingleText.shingleText
import graft.ops.TextOps

/** Specs for the native codegen'd ShingleText expression: the compiled
  * tokenize→n-gram→distinct pass must be bit-identical to the declarative
  * `array_distinct(ngramsOfTokens(tokens(text), n))` path it replaces in
  * the md5-portable consumers (KMV sketches, minhash calibration, the LSH
  * band curve — where the gram TEXT feeds DuckDB-replayable md5). */
class ShingleTextSpec extends AnyFunSuite with SparkFixture {

  import spark.implicits._

  private def declarative(c: org.apache.spark.sql.Column, n: Int) =
    TextOps.shingles(c, n)

  test("bit-identical to the declarative shingle path on fixture docs") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    for (n <- Seq(2, 3, 5)) {
      val mismatches = docs
        .select(declarative(col("text"), n).as("a"),
          shingleText(col("text"), n).as("b"))
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
        shingleText(col("text"), 3).as("b"))
      .collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1))
      if (!r.isNullAt(0)) assert(r.getSeq[String](0) == r.getSeq[String](1))
    }
    // repeated-gram doc: 4 grams with multiplicity, 2 distinct, first-
    // occurrence order preserved
    assert(rows.last.getSeq[String](1) == Seq("a b a", "b a b"))
  }

  test("NgramText (multiplicity) is bit-identical to ngramsOfTokens") {
    import graft.functions.NgramText.ngramText
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    for (n <- Seq(2, 5)) {
      val mismatches = docs
        .select(TextOps.ngramsOfTokens(TextOps.tokens(col("text")), n)
            .as("a"),
          ngramText(col("text"), n).as("b"))
        .filter(not(col("a") <=> col("b")))
        .count()
      assert(mismatches == 0L, s"n=$n")
    }
    // repeats are KEPT, order preserved (posexplode index = position)
    val r = Seq("a b a b a b").toDF("text")
      .select(ngramText(col("text"), 3)).head.getSeq[String](0)
    assert(r == Seq("a b a", "b a b", "a b a", "b a b"))
  }

  test("registered in the SQL function registry") {
    Tables.documents(spark, "/root/testdata/sf0.001").limit(10)
      .createOrReplaceTempView("__stdocs")
    val out = spark.sql(
      "SELECT size(graft_shingle_text(text, 3)) AS k FROM __stdocs")
      .collect()
    assert(out.forall(!_.isNullAt(0)))
  }
}
