package org.apache.spark.sql.graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Exact distributed top-k as a TypedImperativeAggregate (SURVEY §7.4's
  * optional custom-aggregate north star): keeps the k best (score, id)
  * pairs — score descending, id ascending on ties — in a bounded buffer
  * per partition, merges buffers associatively, and emits
  * `array<struct<score double, id bigint>>`.
  *
  * Why an aggregate and not `orderBy().limit(k)`: as an aggregate it
  * composes under `groupBy` (per-group top-k in ONE shuffle of k-row
  * buffers — the "top-k neighbours per query batch" shape) and its
  * partial states are k-bounded, so the shuffle carries O(groups·k)
  * rows regardless of input size. The global form is equivalent to
  * TakeOrderedAndProject.
  *
  * Buffer strategy: append-only ArrayBuffer compacted to k whenever it
  * reaches 2k (amortized O(log k) per row via sort of 2k elems), exact
  * result after final compaction.
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[(Double, Long)]] with ExpectsInputTypes {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()

  override def children: Seq[Expression] = Seq(score, id, kExpr)
  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType, LongType, IntegerType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_topk"

  private def compact(buf: ArrayBuffer[(Double, Long)]): ArrayBuffer[(Double, Long)] = {
    if (buf.length > k) {
      val best = buf.sortBy { case (s, i) => (-s, i) }.take(k)
      buf.clear()
      buf ++= best
    }
    buf
  }

  override def createAggregationBuffer(): ArrayBuffer[(Double, Long)] =
    new ArrayBuffer[(Double, Long)](k + 1)

  override def update(buf: ArrayBuffer[(Double, Long)], input: InternalRow): ArrayBuffer[(Double, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      buf += ((s.asInstanceOf[Double], i.asInstanceOf[Long]))
      if (buf.length >= 2 * k) compact(buf)
    }
    buf
  }

  override def merge(buf: ArrayBuffer[(Double, Long)], other: ArrayBuffer[(Double, Long)]): ArrayBuffer[(Double, Long)] = {
    buf ++= other
    compact(buf)
  }

  override def eval(buf: ArrayBuffer[(Double, Long)]): Any = {
    val best = buf.sortBy { case (s, i) => (-s, i) }.take(k)
    new GenericArrayData(best.map { case (s, i) => InternalRow(s, i) }.toArray[Any])
  }

  override def serialize(buf: ArrayBuffer[(Double, Long)]): Array[Byte] = {
    compact(buf)
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach { case (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new ArrayBuffer[(Double, Long)](n)
    var j = 0
    while (j < n) { buf += ((in.readDouble(), in.readLong())); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(score = newChildren(0), id = newChildren(1), kExpr = newChildren(2))
}
