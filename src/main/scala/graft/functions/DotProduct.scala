package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst dot product over two `array<double>` columns.
  *
  * The one place in this engine where built-in operators genuinely can't
  * express the computation efficiently: higher-order `zip_with`/`aggregate`
  * folds are CodegenFallback (interpreted per element, measured ~200 ns/
  * element), which dominates pairwise vector workloads (millions of pairs ×
  * 64 elements). This expression generates a tight primitive loop inside
  * whole-stage codegen — no boxing, no lambda dispatch, no intermediate
  * array.
  *
  * Null semantics: null if either array is null; null if the arrays differ
  * in length (matching [[graft.ops.DedupOps.dot]]'s zip_with-padding fold,
  * where the padded null poisons the sum — a dimension bug upstream
  * surfaces as null in BOTH paths instead of being silently truncated);
  * null ELEMENTS contribute 0 (embeddings never carry null elements).
  * Accumulation is sequential left-to-right — bit-identical to the
  * interpreted fold and to DuckDB's list_cosine_similarity on the same
  * normalized inputs.
  *
  * Registered as SQL function `graft_dot` by [[GraftExtensions]].
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot requires two array<double> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def prettyName: String = "graft_dot"

  /** Length mismatch → null, so nullable even over non-null children. */
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var s = 0.0
      var i = 0
      while (i < n) {
        if (!x.isNullAt(i) && !y.isNullAt(i)) s += x.getDouble(i) * y.getDouble(i)
        i += 1
      }
      s
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |      $s += $a.getDouble($i) * $b.getDouble($i);
         |    }
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Column wrapper via the public function registry (requires the session
    * to be built with GraftExtensions — all graft session builders are).
    * Inputs cast to array<double>. */
  def dotNative(a: Column, b: Column): Column =
    call_function("graft_dot", a.cast("array<double>"), b.cast("array<double>"))
}
