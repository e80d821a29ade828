package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.BloomContains

/** Specs for the codegen'd broadcast-Bloom membership expression that
  * replaced the engine's one Scala udf: the compiled probe must agree
  * bit-for-bit with driver-side BloomFilter.mightContainLong, have no
  * false negatives on inserted keys, and propagate null. */
class BloomContainsSpec extends AnyFunSuite with SparkFixture {

  import spark.implicits._

  test("agrees with driver-side mightContainLong; no false negatives") {
    val inserted = (1L to 500L).map(_ * 2654435761L)
    val bf = org.apache.spark.util.sketch.BloomFilter.create(1000, 0.01)
    inserted.foreach(bf.putLong)
    val bc = spark.sparkContext.broadcast(bf)
    val probes = (inserted ++ (1L to 500L).map(-_ * 40503L)).toDF("h")
    val got = probes
      .select(col("h"), BloomContains.contains(col("h"), bc).as("m"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    got.foreach { case (h, m) =>
      assert(m == bf.mightContainLong(h), s"probe $h")
    }
    assert(inserted.forall(got(_)), "false negative on an inserted key")
  }

  test("null hash propagates null") {
    val bf = org.apache.spark.util.sketch.BloomFilter.create(10, 0.01)
    bf.putLong(7L)
    val bc = spark.sparkContext.broadcast(bf)
    val r = Seq(Some(7L), Option.empty[Long]).toDF("h")
      .select(BloomContains.contains(col("h"), bc).as("m")).collect()
    assert(r(0).getBoolean(0) && r(1).isNullAt(0))
  }
}
