package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, lit, typedlit}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

/** Multi-table hyperplane-LSH bucket signature over an `array<double>`
  * vector: returns `array<long>` of length `tables` where element t packs
  * the sign bits of `bits` hyperplane dot products (bit b set iff
  * `dot(vec, plane[t*bits+b]) >= 0`).
  *
  * Why a custom expression and not composed `graft_dot`s: a 24-table ×
  * 4-bit scheme over 64-dim vectors is 96 dots whose plane weights, spelled
  * as per-plane literal arrays, make a ~10k-node Catalyst tree. The DATA
  * cost of that tree is trivial; the PLANNING cost is not — every action
  * re-analyzes and re-optimizes it, a measured ~4s fixed overhead per
  * query at any data size. Here the whole plane matrix rides in ONE
  * flattened literal (a single tree node), and codegen emits a three-level
  * primitive loop (tables × bits × dim) with the weights bound once per
  * JVM via `addReferenceObj`.
  *
  * Null semantics (parity with the composed form it replaces): null vector
  * → null; vector length ≠ `dim` → null, so malformed embeddings fall out
  * of inner bucket joins instead of colliding in bucket 0 of every table;
  * null ELEMENTS contribute 0 to each dot (mirrors [[DotProduct]]).
  *
  * `planes` (flattened tables×bits×dim weights), `bits` and `dim` must be
  * foldable; they are evaluated once at plan time.
  *
  * Registered as SQL function `graft_lsh_buckets` by [[GraftExtensions]].
  */
case class LshBuckets(vec: Expression, planes: Expression,
                      bits: Expression, dim: Expression) extends Expression {

  override def children: Seq[Expression] = Seq(vec, planes, bits, dim)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  override def prettyName: String = "graft_lsh_buckets"

  override def checkInputDataTypes(): TypeCheckResult = {
    def arr(dt: DataType): Boolean = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (!arr(vec.dataType) || !arr(planes.dataType))
      TypeCheckResult.TypeCheckFailure(
        "graft_lsh_buckets requires array<double> vec and planes, got " +
          s"${vec.dataType.simpleString} and ${planes.dataType.simpleString}")
    else if (bits.dataType != IntegerType || dim.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure("bits and dim must be int")
    else if (!planes.foldable || !bits.foldable || !dim.foldable)
      TypeCheckResult.TypeCheckFailure(
        "planes, bits and dim must be foldable (plan-time constants)")
    else {
      // All three are foldable, so the plane-matrix shape is checkable at
      // analysis time; a truncating tables = len / (bits*dim) would
      // silently emit fewer-table signatures for a malformed matrix.
      val nPlanes = planes.eval(null).asInstanceOf[ArrayData].numElements()
      val perTable = bits.eval(null).asInstanceOf[Int] *
        dim.eval(null).asInstanceOf[Int]
      if (perTable <= 0 || nPlanes % perTable != 0)
        TypeCheckResult.TypeCheckFailure(
          s"planes length $nPlanes is not a positive multiple of " +
            s"bits*dim = $perTable")
      else TypeCheckResult.TypeCheckSuccess
    }
  }

  @transient private lazy val weights: Array[Double] =
    planes.eval(null).asInstanceOf[ArrayData].toDoubleArray()
  @transient private lazy val bitsV: Int = bits.eval(null).asInstanceOf[Int]
  @transient private lazy val dimV: Int = dim.eval(null).asInstanceOf[Int]
  @transient private lazy val tablesV: Int = weights.length / (bitsV * dimV)

  override def eval(input: InternalRow): Any = {
    val v = vec.eval(input)
    if (v == null) return null
    val x = v.asInstanceOf[ArrayData]
    if (x.numElements() != dimV) return null
    val out = new Array[Long](tablesV)
    var t = 0
    while (t < tablesV) {
      var bucket = 0L
      var b = 0
      while (b < bitsV) {
        var s = 0.0
        val off = (t * bitsV + b) * dimV
        var j = 0
        while (j < dimV) {
          if (!x.isNullAt(j)) s += x.getDouble(j) * weights(off + j)
          j += 1
        }
        if (s >= 0) bucket |= 1L << b
        b += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val w = ctx.addReferenceObj("lshWeights", weights, "double[]")
    val vecCode = vec.genCode(ctx)
    val arrCls = classOf[ArrayData].getName
    val genCls = classOf[GenericArrayData].getName
    val out = ctx.freshName("out")
    val t = ctx.freshName("t")
    val b = ctx.freshName("b")
    val j = ctx.freshName("j")
    val s = ctx.freshName("s")
    val off = ctx.freshName("off")
    val bucket = ctx.freshName("bucket")
    ev.copy(code =
      code"""
         |${vecCode.code}
         |boolean ${ev.isNull} = true;
         |$arrCls ${ev.value} = null;
         |if (!${vecCode.isNull} && ${vecCode.value}.numElements() == $dimV) {
         |  long[] $out = new long[$tablesV];
         |  for (int $t = 0; $t < $tablesV; $t++) {
         |    long $bucket = 0L;
         |    for (int $b = 0; $b < $bitsV; $b++) {
         |      double $s = 0.0;
         |      int $off = ($t * $bitsV + $b) * $dimV;
         |      for (int $j = 0; $j < $dimV; $j++) {
         |        if (!${vecCode.value}.isNullAt($j)) {
         |          $s += ${vecCode.value}.getDouble($j) * $w[$off + $j];
         |        }
         |      }
         |      if ($s >= 0) $bucket |= 1L << $b;
         |    }
         |    $out[$t] = $bucket;
         |  }
         |  ${ev.isNull} = false;
         |  ${ev.value} = new $genCls($out);
         |}
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): LshBuckets =
    copy(vec = newChildren(0), planes = newChildren(1),
      bits = newChildren(2), dim = newChildren(3))
}

object LshBuckets {
  /** Column wrapper via the function registry (sessions built with
    * GraftExtensions). `planesFlat` is the row-major tables×bits×dim
    * weight matrix, shipped as ONE literal node. */
  def bucketsNative(vec: Column, planesFlat: Array[Double],
                    bits: Int, dim: Int): Column =
    call_function("graft_lsh_buckets", vec.cast("array<double>"),
      typedlit(planesFlat.toSeq), lit(bits), lit(dim))
}
