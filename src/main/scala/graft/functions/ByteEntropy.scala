package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst Shannon entropy (base 2) over a string's BYTES — the
  * character-diversity quality signal (gibberish and template boilerplate
  * sit at the entropy extremes; natural prose clusters mid-range).
  *
  * Same rationale as [[ShingleHashes]]: a declarative spelling needs a
  * per-row char histogram (explode + groupBy per doc, or interpreted
  * higher-order folds) — this is one compiled 256-counter pass per row,
  * projected inside whole-stage codegen, no shuffle. On the all-ASCII
  * fixtures byte entropy equals character entropy (DuckDB's `entropy()`
  * aggregate over the exploded characters is the oracle); on multi-byte
  * UTF-8 it is a byte-level measure — documented, still a monotone
  * diversity signal.
  *
  * Null text → null; empty text → 0.0. Summation runs in ascending byte
  * order — one fixed association order.
  *
  * Registered as SQL function `graft_entropy` by [[GraftExtensions]]. */
case class ByteEntropy(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_entropy requires a string column, got ${child.dataType.simpleString}")

  override def prettyName: String = "graft_entropy"

  override def nullSafeEval(t: Any): Any =
    ByteEntropy.compute(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.ByteEntropy.compute($t)")

  override protected def withNewChildInternal(newChild: Expression): ByteEntropy =
    copy(child = newChild)
}

object ByteEntropy {
  private val LOG2 = math.log(2.0)

  def compute(t: UTF8String): Double = {
    val b = t.getBytes
    val n = b.length
    if (n == 0) return 0.0
    val counts = new Array[Int](256)
    var i = 0
    while (i < n) { counts(b(i) & 0xff) += 1; i += 1 }
    var h = 0.0
    i = 0
    while (i < 256) {
      val c = counts(i)
      if (c > 0) { val p = c.toDouble / n; h -= p * (math.log(p) / LOG2) }
      i += 1
    }
    h
  }

  /** Column wrapper via the SQL registry. */
  def entropy(text: Column): Column = call_function("graft_entropy", text)
}
