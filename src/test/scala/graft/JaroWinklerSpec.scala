package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.JaroWinkler

/** Specs for the native codegen'd Jaro/Jaro–Winkler expression.
  *
  * The probe constants below are the EXACT doubles DuckDB's
  * `jaro_similarity` / `jaro_winkler_similarity` return (captured from
  * DuckDB 1.x on 2026-08-14) — bit-for-bit equality here is what lets the
  * d21/d22 linkage gates hash-match the oracle at full scale. The pinned
  * semantics: integer-division transposition count, empty-string → 0.0,
  * prefix boost only above jaro 0.7, prefix capped at 4.
  */
class JaroWinklerSpec extends AnyFunSuite with SparkFixture {

  import spark.implicits._

  private def jw(a: String, b: String): Double =
    JaroWinkler.similarity(UTF8String.fromString(a),
      UTF8String.fromString(b), winkler = true)
  private def jaro(a: String, b: String): Double =
    JaroWinkler.similarity(UTF8String.fromString(a),
      UTF8String.fromString(b), winkler = false)

  test("probe constants match DuckDB bit-for-bit") {
    assert(jaro("MARTHA", "MARHTA") == 0.9444444444444445)
    assert(jw("MARTHA", "MARHTA") == 0.9611111111111111)
    assert(jaro("DWAYNE", "DUANE") == 0.8222222222222223)
    assert(jw("DWAYNE", "DUANE") == 0.8400000000000001)
    assert(jw("DIXON", "DICKSONX") == 0.8133333333333332)
    // integer-division transpositions: 3 mismatched positions → t = 1
    assert(jaro("ABCVWXYZ", "CABVWXYZ") == 0.9583333333333334)
    assert(jw("aaapple", "apple") == 0.9142857142857143)
    assert(jaro("CRATE", "TRACE") == 0.7333333333333334)
    // prefix cap 4: common prefix is 6 but only 4 count
    assert(jw("AAAAAABC", "AAAAAACB") == 0.975)
    // boost threshold: jaro ≤ 0.7 gets NO winkler boost
    assert(jw("ABCDEFGHIJ", "ABCDEXXXXX") == 0.6666666666666666)
    assert(jw("AB", "AX") == 0.6666666666666666)
    assert(jw("ABCD", "ABCX") == 0.8833333333333334)
  }

  test("edge semantics: empties, no matches, identity, case") {
    assert(jw("", "") == 0.0) // DuckDB convention, NOT the 1.0 some libs use
    assert(jw("", "ABC") == 0.0)
    assert(jw("A", "A") == 1.0)
    assert(jw("AB", "BA") == 0.0) // window 0 → no matches
    assert(jw("abc", "ABC") == 0.0) // case-sensitive
    assert(jw("x", "y") == 0.0)
  }

  test("value symmetry and range on fixture-shaped pairs") {
    val words = Seq("small ring", "red widget", "blue bolt", "red gear",
      "shiny plate", "small rig", "", "a")
    for (a <- words; b <- words) {
      val s = jw(a, b)
      assert(s == jw(b, a), s"asymmetric for ($a, $b)")
      assert(s >= 0.0 && s <= 1.0)
      assert(jaro(a, b) <= s + 1e-15) // boost never decreases
    }
  }

  test("Column front door, SQL registry, and null propagation agree") {
    val df = Seq(("MARTHA", "MARHTA"), ("DWAYNE", "DUANE"), (null, "X"))
      .toDF("a", "b")
    val viaCol = df.select(
      JaroWinkler.jaroWinkler(col("a"), col("b")).as("s")).collect()
    assert(viaCol(0).getDouble(0) == 0.9611111111111111)
    assert(viaCol(1).getDouble(0) == 0.8400000000000001)
    assert(viaCol(2).isNullAt(0))
    df.createOrReplaceTempView("jwprobe")
    val viaSql = spark.sql(
      "SELECT graft_jaro_winkler(a, b), graft_jaro(a, b) FROM jwprobe " +
        "WHERE a IS NOT NULL ORDER BY a").collect()
    assert(viaSql(1).getDouble(0) == 0.9611111111111111)
    assert(viaSql(0).getDouble(1) == 0.8222222222222223)
  }
}
