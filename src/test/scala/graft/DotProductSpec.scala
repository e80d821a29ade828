package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.DotProduct.dotNative
import graft.ops.DedupOps

/** Specs for the native codegen'd DotProduct expression. */
class DotProductSpec extends AnyFunSuite with SparkFixture {

  import spark.implicits._

  private lazy val df = Seq(
    (Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
    (Array(1.0, 0.0), Array(0.0, 1.0))).toDF("a", "b")

  test("dotNative matches hand computation and the interpreted fold") {
    val out = df.select(
      dotNative(col("a"), col("b")).as("native"),
      DedupOps.dot(col("a"), col("b")).as("folded")).collect()
    assert(out(0).getDouble(0) == 32.0)
    assert(out(1).getDouble(0) == 0.0)
    // bit-identical to the interpreted fold (same accumulation order)
    assert(out.forall(r => r.getDouble(0) == r.getDouble(1)))
  }

  test("null array yields null; float arrays cast transparently") {
    val d2 = Seq((Some(Array(1.0f, 2.0f)), Option.empty[Array[Float]]))
      .toDF("a", "b")
    val r = d2.select(dotNative(col("a"), col("a")).as("aa"),
      dotNative(col("a"), col("b")).as("ab")).head()
    assert(r.getDouble(0) == 5.0)
    assert(r.isNullAt(1))
  }

  test("length mismatch yields null in BOTH the native and fold paths") {
    // zip_with pads the shorter array with nulls, which poisons the fold to
    // null; the native expression must agree so a malformed embedding
    // surfaces identically everywhere instead of being silently truncated.
    val d = Seq((Array(1.0, 2.0, 3.0), Array(1.0, 2.0))).toDF("a", "b")
    val r = d.select(dotNative(col("a"), col("b")).as("native"),
      DedupOps.dot(col("a"), col("b")).as("folded")).head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("participates in whole-stage codegen (no CodegenFallback)") {
    // local relations constant-fold away — use a range source so a real
    // codegen stage materializes.
    val plan = spark.range(10)
      .select(array(col("id").cast("double"), lit(2.0)).as("a"),
        array(lit(3.0), col("id").cast("double")).as("b"))
      .select(dotNative(col("a"), col("b")))
      .queryExecution.executedPlan.toString
    // the "*(n)" prefix marks operators inside a WholeStageCodegen stage
    assert(plan.contains("*(1) Project [graft_dot"), plan)
  }

  test("registered as SQL function graft_dot via SparkSessionExtensions") {
    df.createOrReplaceTempView("vecs")
    val r = spark.sql("SELECT graft_dot(a, b) AS d FROM vecs ORDER BY d DESC")
      .collect().map(_.getDouble(0)).toSeq
    assert(r == Seq(32.0, 0.0))
  }

  test("SQL-registered text fns are bit-identical to the Column API") {
    Tables.registerAll(spark, "/root/testdata/sf0.001")
    val viaSql = spark.sql(
      """SELECT doc_id, graft_quality(text) AS q, graft_fingerprint(text)
         AS fp, graft_lang_id(text) AS lg FROM documents""")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val viaCol = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"),
        graft.ops.TextOps.qualityScore(col("text")).as("q"),
        graft.ops.TextOps.fingerprint(col("text")).as("fp"),
        graft.ops.TextOps.langId(col("text")).as("lg"))
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(viaSql == viaCol)
  }

  test("agrees with the exact kNN path on real embeddings") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001").limit(50)
    val n = DedupOps.normalized(e, "vec_id", "embedding", "id", "v")
    val both = n.as("x").join(n.as("y"), col("x.id") < col("y.id"))
      .select(dotNative(col("x.v"), col("y.v")).as("native"),
        DedupOps.dot(col("x.v"), col("y.v")).as("folded"))
      .collect()
    assert(both.forall(r => r.getDouble(0) == r.getDouble(1)))
  }
}
