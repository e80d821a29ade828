package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters sketch as a native mergeable AGGREGATE
  * expression — the "what are the dominant values of this column"
  * question (top domains, top languages, hot keys) answered in ONE pass
  * with a fixed `k`-counter state per partial, independent of
  * cardinality. The declarative alternative (groupBy value + count +
  * top-k) shuffles one row per DISTINCT value — fine until the column is
  * high-cardinality at 100 TB; this sketch's shuffle payload is ≤ k
  * entries per map partial, period.
  *
  * Guarantees (classic MG + the standard merge): reported counts are
  * LOWER bounds of true counts, under-counting each item by at most
  * n/(k+1); every item with true frequency > n/(k+1) is present in the
  * output. When the column's distinct-value count never exceeds `k`, no
  * counter is ever evicted and the sketch is EXACT — which is what lets
  * the driver gate hash-match a plain GROUP BY oracle on bounded-domain
  * columns while OpsSpec asserts the eviction-regime bounds.
  *
  * Output: array<struct<item string, cnt long>> sorted (cnt desc, item
  * asc). Merge = counter-wise sum, then subtract the (k+1)-th largest
  * count from all and drop non-positives (preserves the bound).
  *
  * Registered as SQL aggregate `graft_freq_items(col, k)` by
  * [[GraftExtensions]]. */
case class FreqItems(child: Expression, k: Int,
                     mutableAggBufferOffset: Int = 0,
                     inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
    with UnaryLike[Expression] {

  require(k >= 1, "graft_freq_items needs k >= 1")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType), StructField("cnt", LongType))))

  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_freq_items requires a string column, got ${child.dataType.simpleString}")

  override def prettyName: String = "graft_freq_items"

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      buf.get(s) match {
        case Some(c) => buf.update(s, c + 1)
        case None if buf.size < k => buf.update(s, 1L)
        case None =>
          // decrement-all step: every counter pays one; zeros drop out
          val dead = mutable.ArrayBuffer.empty[String]
          buf.keysIterator.foreach { key =>
            val c = buf(key) - 1
            if (c <= 0) dead += key else buf.update(key, c)
          }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(buf: mutable.HashMap[String, Long],
                     other: mutable.HashMap[String, Long]):
      mutable.HashMap[String, Long] = {
    other.foreach { case (s, c) =>
      buf.update(s, buf.getOrElse(s, 0L) + c)
    }
    if (buf.size > k) {
      // subtract the (k+1)-th largest count from everything; ≤ k survive
      val cut = buf.values.toArray.sortBy(-_).apply(k)
      val dead = mutable.ArrayBuffer.empty[String]
      buf.keysIterator.foreach { key =>
        val c = buf(key) - cut
        if (c <= 0) dead += key else buf.update(key, c)
      }
      dead.foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val sorted = buf.toSeq.sortBy { case (s, c) => (-c, s) }
    new GenericArrayData(sorted.map { case (s, c) =>
      InternalRow(UTF8String.fromString(s), c)
    }.toArray[Any])
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (s, c) =>
      val b = s.getBytes("UTF-8")
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(new String(b, "UTF-8"), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqItems =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): FreqItems =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression): FreqItems =
    copy(child = newChild)
}

object FreqItems {
  /** Column wrapper via the SQL registry. */
  def freqItems(col: Column, k: Int): Column =
    call_function("graft_freq_items", col, lit(k))
}
