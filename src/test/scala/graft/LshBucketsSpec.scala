package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.{DotProduct, LshBuckets}

/** Specs for the native codegen'd LshBuckets expression: it must be
  * bit-identical to the composed per-plane spelling it replaced (the
  * d06/v02 gates' bucket values depend on it). */
class LshBucketsSpec extends AnyFunSuite with SparkFixture {

  import spark.implicits._

  private val tables = 3
  private val bits = 4
  private val dim = 8
  private val planes: Array[Array[Double]] = {
    val rnd = new scala.util.Random(7L)
    Array.fill(tables * bits, dim)(rnd.nextDouble() * 2 - 1)
  }

  /** The pre-expression spelling: one graft_dot per plane, when(dot >= 0)
    * packing — kept here as the semantic oracle. */
  private def composed(vec: org.apache.spark.sql.Column) = array(
    (0 until tables).map { t =>
      (0 until bits).map { b =>
        val w = array(planes(t * bits + b).map(lit): _*)
        val dot = DotProduct.dotNative(vec, w)
        when(dot >= 0, lit(1L << b)).when(dot < 0, lit(0L))
      }.reduce(_ + _)
    }: _*)

  private lazy val vecs = (1 to 40)
    .map(i => Tuple1(Array.tabulate(dim)(j => math.sin(i * 31 + j).toDouble)))
    .toDF("v")

  test("matches the composed per-plane dot spelling bit-for-bit") {
    val out = vecs.select(
      LshBuckets.bucketsNative(col("v"), planes.flatten, bits, dim).as("fast"),
      composed(col("v")).as("slow")).collect()
    out.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1))
    }
  }

  test("null vector and wrong dimension yield null (not bucket 0)") {
    val d = Seq(
      (1L, Some(Array.fill(dim)(0.5))),
      (2L, Some(Array.fill(dim - 1)(0.5))), // malformed: short vector
      (3L, Option.empty[Array[Double]])
    ).toDF("id", "v")
    val r = d.select(col("id"),
        LshBuckets.bucketsNative(col("v"), planes.flatten, bits, dim).as("b"))
      .orderBy("id").collect()
    assert(!r(0).isNullAt(1))
    assert(r(1).isNullAt(1), "length-mismatch vector must hash to null")
    assert(r(2).isNullAt(1))
  }

  test("participates in whole-stage codegen (no CodegenFallback)") {
    val plan = spark.range(10)
      .select(array((0 until dim).map(j =>
        (col("id") + lit(j)).cast("double")): _*).as("v"))
      .select(LshBuckets.bucketsNative(col("v"), planes.flatten, bits, dim))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [graft_lsh_buckets"), plan)
  }

  test("interpreted eval agrees with codegen (signature values)") {
    // force the interpreted path through a plain Project over a local
    // relation (constant-folds through eval) vs the codegen'd range path
    val v = Array.tabulate(dim)(j => math.cos(j * 3.0))
    val lit1 = typedlit(v.toSeq)
    val folded = spark.range(1)
      .select(LshBuckets.bucketsNative(lit1, planes.flatten, bits, dim).as("b"))
      .head().getSeq[Long](0)
    val fromDf = Seq(Tuple1(v)).toDF("v")
      .select(LshBuckets.bucketsNative(col("v"), planes.flatten, bits, dim).as("b"))
      .head().getSeq[Long](0)
    assert(folded == fromDf)
  }
}
