package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters sketch as a native Catalyst
  * `TypedImperativeAggregate` — the bounded-memory path to "top tokens"
  * at 100 TB, where the exact form (`TextAnalysis.vocabulary`) must
  * shuffle one `(token, count)` pair per DISTINCT token and a web-scale
  * corpus has billions of them. This sketch keeps at most `k` counters
  * per partial buffer, shuffles only those k entries per map task, and
  * guarantees (classic MG bound): any token with true frequency
  * `> N/(k+1)` is present in the result, with reported count
  * underestimating the true count by at most `N/(k+1)` (N = total
  * tokens). The merge subtracts the (k+1)-th largest count when the
  * union overflows — the standard mergeable-summaries formulation, which
  * preserves the bound under Spark's partial/final aggregation.
  *
  * Exactness caveat (why this is ScalaTest-verified, not oracle-gated):
  * reported counts depend on traversal order across partitions, so
  * results are not bit-stable across engines — the INCLUSION guarantee
  * and error bound are the contract, and the spec asserts exactly those
  * against exact counts.
  */
case class MisraGries(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(k >= 1, "k must be >= 1")

  override def children: Seq[Expression] = Seq(child)
  // non-string inputs fail at analysis time instead of
  // ClassCastException-ing every task at execution
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"misra_gries requires STRING input, got ${child.dataType.catalogString}")
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("token", StringType, nullable = false),
    StructField("count", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "misra_gries"

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val token = v.asInstanceOf[UTF8String].toString
      if (buf.contains(token)) buf(token) += 1L
      else if (buf.size < k) buf(token) = 1L
      else {
        // decrement-all: the counter-sharing step that buys the bound
        val dead = mutable.ArrayBuffer.empty[String]
        buf.mapValuesInPlace((_, c) => c - 1L)
        buf.foreach { case (t, c) => if (c <= 0L) dead += t }
        dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(buf: mutable.HashMap[String, Long],
                     other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (t, c) => buf(t) = buf.getOrElse(t, 0L) + c }
    if (buf.size > k) {
      // subtract the (k+1)-th largest count, drop the non-positive tail
      val counts = buf.values.toArray
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - (k + 1)) // (k+1)-th largest
      val dead = mutable.ArrayBuffer.empty[String]
      buf.mapValuesInPlace((_, c) => c - cut)
      buf.foreach { case (t, c) => if (c <= 0L) dead += t }
      dead.foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val sorted = buf.toSeq.sortBy { case (t, c) => (-c, t) }
    new GenericArrayData(sorted.map { case (t, c) =>
      InternalRow(UTF8String.fromString(t), c): Any
    }.toArray)
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.size)
    buf.foreach { case (t, c) =>
      val tb = t.getBytes("UTF-8")
      out.writeInt(tb.length); out.write(tb); out.writeLong(c)
    }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(storage: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(storage))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val tb = new Array[Byte](len); in.readFully(tb)
      buf(new String(tb, "UTF-8")) = in.readLong()
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): MisraGries =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MisraGries =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object MisraGries {
  /** Heavy-hitters aggregate column: array<struct<token, count>> of at
    * most k entries, count-descending.
    */
  def misra_gries(c: Column, k: Int): Column =
    GraftBridge.column(MisraGries(GraftBridge.expression(c), k)
      .toAggregateExpression())
}
