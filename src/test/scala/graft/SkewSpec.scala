package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.SkewOps

/** Salted join must be row-identical to the plain join, under skew. */
class SkewSpec extends AnyFunSuite with SparkFixture {

  import spark.implicits._

  test("saltedJoin equals plain join on a skewed key distribution") {
    // 90% of rows share key 1 (the hot key).
    val big = ((1 to 900).map(i => (1L, i.toLong))
      ++ (1 to 100).map(i => ((i % 7 + 2).toLong, i.toLong)))
      .toDF("k", "row_id")
    val small = Seq((1L, "hot"), (2L, "a"), (3L, "b"), (9L, "unused"))
      .toDF("k", "label")

    val plain = big.join(small, Seq("k")).select("k", "row_id", "label")
      .collect().map(_.toSeq).toSet
    val salted = SkewOps.saltedJoin(big, small, "k", "row_id", saltBuckets = 8)
      .select("k", "row_id", "label").collect().map(_.toSeq).toSet
    assert(salted == plain)
    assert(salted.nonEmpty)
  }

  test("saltedJoin left join keeps unmatched big-side rows exactly once") {
    val big = Seq((1L, 10L), (2L, 20L), (5L, 50L)).toDF("k", "row_id")
    val small = Seq((1L, "x")).toDF("k", "label")
    val out = SkewOps.saltedJoin(big, small, "k", "row_id", 4, "left")
      .orderBy("row_id").collect().map(r => (r.getLong(1), r.get(2))).toSeq
    assert(out == Seq((10L, "x"), (20L, null), (50L, null)))
  }

  test("keySkewProfile surfaces the hot key with its share") {
    val big = ((1 to 90).map(_ => (1L, 0L)) ++ (1 to 10).map(i => (i.toLong + 1, 0L)))
      .toDF("k", "v")
    val top = SkewOps.keySkewProfile(big, "k", 1).collect().head
    assert(top.getLong(0) == 1L && top.getDouble(2) == 0.9)
  }

  test("GFrame fillna/dropna/describe") {
    val gf = core.GFrame.fromDF(
      Seq((1L, Some(1.0)), (2L, None), (3L, Some(3.0)))
        .toDF("id", "v"), "id")
    assert(gf.fillna(0.0).toDF.orderBy("id").collect().map(_.getDouble(1)).toSeq
      == Seq(1.0, 0.0, 3.0))
    assert(gf.dropna().count() == 2)
    // pandas-style describe: 8 stat rows; aggregates skip the null
    val d = gf.describe("v").df.collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(d.size == 8 && d("count") == 2.0 && d("mean") == 2.0)
  }
}
