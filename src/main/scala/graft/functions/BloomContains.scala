package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Native Catalyst membership probe against a BROADCAST Bloom filter —
  * the codegen'd replacement for the one Scala `udf()` the engine used to
  * carry ([[graft.ops.DedupOps.bloomContamination]]'s pre-join filter).
  *
  * The expression field is the broadcast HANDLE, not the bitset: plan
  * serialization ships a few bytes per task and each executor fetches the
  * ~MB bitset once via the block manager (exactly what the udf closure
  * did, minus the per-row boxing and the codegen fence — a black-box udf
  * ends the whole-stage-codegen span and forces Long boxing per call;
  * this stays inside the compiled pipeline as one virtual call).
  *
  * Not registered in the SQL function registry: a bitset-valued argument
  * has no SQL literal spelling (Spark's own runtime-filter expression
  * takes the serialized bytes as a scalar subquery instead). Construct
  * via [[BloomContains.contains]].
  *
  * Null input → null (the udf path returned false for null via NPE-free
  * boxing; shingle hashes are never null in practice — both paths agree
  * on all real rows). */
case class BloomContains(child: Expression, bloom: Broadcast[BloomFilter])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_contains requires a bigint column, got " +
        child.dataType.simpleString)

  override def prettyName: String = "graft_bloom_contains"

  override def nullSafeEval(v: Any): Any =
    bloom.value.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    // reference the broadcast handle; .value() resolves executor-side to
    // the locally cached bitset (one fetch per executor, not per task)
    val bc = ctx.addReferenceObj("bloomBc", bloom,
      classOf[Broadcast[BloomFilter]].getName)
    defineCodeGen(ctx, ev, v =>
      s"((org.apache.spark.util.sketch.BloomFilter)$bc.value())" +
        s".mightContainLong($v)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): BloomContains = copy(child = newChild)
}

object BloomContains {
  /** Column wrapper: probe `hash` (bigint) against the broadcast filter. */
  def contains(hash: Column, bloom: Broadcast[BloomFilter]): Column =
    ColumnBridge.column(
      BloomContains(ColumnBridge.expression(hash), bloom))
}
