package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters sketch as a native Spark aggregate
  * (`TypedImperativeAggregate`) — the constant-memory distributed
  * top-k candidate generator: `graft_freq_items(col, k)` returns the
  * ≤ k candidate items whose true frequency CAN exceed N/(k+1); any
  * item with frequency > N/(k+1) is guaranteed present (the classic
  * MG deterministic bound), so an exact recount over the candidate
  * set yields the exact top-m for every m whose m-th frequency
  * clears the bound.
  *
  * Buffer: a ≤ k-entry counter map. Update is amortized O(1)
  * (decrement-all happens at most once per k updates); merge is the
  * mergeable-summaries combine (Agarwal et al.: sum counters, then
  * subtract the (k+1)-th largest value and drop non-positives), so
  * the aggregate is map-side-partial/shuffle-final like any built-in
  * — one pass, no shuffle of the raw occurrences, which is the whole
  * point at 100 TB where the exact groupBy's shuffle key space is
  * the corpus vocabulary.
  *
  * Output: candidates ordered by (estimated count desc, item asc) —
  * deterministic for a deterministic input partition -> counter
  * outcome; downstream consumers recount exactly and DO NOT rely on
  * the estimates (see `text_top_tokens_sketch`).
  */
case class FreqItemsSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType && k >= 1)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      "graft_freq_items(col, k) needs a string column and k >= 1")
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_freq_items"

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty[String, Long]

  override def update(buf: mutable.HashMap[String, Long],
                      row: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(row)
    if (v != null) {
      val item = v.asInstanceOf[UTF8String].toString
      buf.get(item) match {
        case Some(c) => buf.update(item, c + 1)
        case None if buf.size < k => buf.update(item, 1L)
        case None => // decrement-all step: every counter pays one
          val dead = mutable.ArrayBuffer.empty[String]
          buf.foreach { case (key, c) =>
            if (c == 1L) dead += key else buf.update(key, c - 1)
          }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(a: mutable.HashMap[String, Long],
                     b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b.foreach { case (key, c) => a.update(key, a.getOrElse(key, 0L) + c) }
    if (a.size > k) {
      // mergeable-summaries combine: subtract the (k+1)-th largest
      // counter from every entry, drop the non-positive remainder
      val cut = a.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      val dead = mutable.ArrayBuffer.empty[String]
      a.foreach { case (key, c) =>
        if (c - cut <= 0L) dead += key else a.update(key, c - cut)
      }
      dead.foreach(a.remove)
    }
    a
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any =
    new GenericArrayData(
      buf.toArray.sortBy { case (item, c) => (-c, item) }
        .map { case (item, _) => UTF8String.fromString(item) })

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val entries = buf.toArray
    val byteArrays = entries.map(e => e._1.getBytes(StandardCharsets.UTF_8))
    val size = 4 + byteArrays.map(_.length + 4 + 8).sum
    val bb = ByteBuffer.allocate(size)
    bb.putInt(entries.length)
    entries.indices.foreach { i =>
      bb.putInt(byteArrays(i).length)
      bb.put(byteArrays(i))
      bb.putLong(entries(i)._2)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = mutable.HashMap.empty[String, Long]
    (0 until n).foreach { _ =>
      val len = bb.getInt
      val arr = new Array[Byte](len)
      bb.get(arr)
      buf.update(new String(arr, StandardCharsets.UTF_8), bb.getLong)
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqItemsSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqItemsSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): FreqItemsSketch =
    copy(child = newChildren(0))
}
