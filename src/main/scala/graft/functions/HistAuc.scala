package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Histogram-sketched ROC-AUC as a native Spark aggregate
  * (`TypedImperativeAggregate`) — the streaming-capable form of the
  * reference's offline `roc_auc_score`
  * (`services/training/app/training.py:53-55`).
  *
  * Buffer: two fixed-width score histograms (positives / negatives,
  * `Bins` buckets over [0,1]). Update is O(1), merge is element-wise
  * add — associative + commutative, so the aggregate works map-side
  * partial, in `observe()`, and in update-mode streaming where the
  * exact rank statistic (global sort) is unavailable. AUC from the
  * histograms is the Mann-Whitney statistic with ties-within-bin
  * resolved as 0.5 — error bounded by ~1/Bins.
  */
case class HistAuc(
    label: Expression,
    score: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  val Bins = 2048

  override def children: Seq[Expression] = Seq(label, score)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (children.forall(_.dataType == DoubleType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      "graft_auc(label, score) needs double inputs")
  override def nullable: Boolean = false
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_auc"

  // buffer layout: [pos(0..Bins-1) | neg(0..Bins-1)]
  override def createAggregationBuffer(): Array[Long] = new Array[Long](2 * Bins)

  override def update(buf: Array[Long], row: InternalRow): Array[Long] = {
    val yAny = label.eval(row)
    val sAny = score.eval(row)
    if (yAny != null && sAny != null) {
      val s = sAny.asInstanceOf[Double]
      val bin = math.min(Bins - 1, math.max(0, (s * Bins).toInt))
      val idx = if (yAny.asInstanceOf[Double] >= 0.5) bin else Bins + bin
      buf(idx) += 1L
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = {
    var negBelow = 0.0
    var pairs = 0.0
    var p = 0.0; var n = 0.0
    var i = 0
    while (i < Bins) {
      val pos = buf(i).toDouble
      val neg = buf(Bins + i).toDouble
      pairs += pos * negBelow + 0.5 * pos * neg
      negBelow += neg
      p += pos; n += neg
      i += 1
    }
    if (p == 0.0 || n == 0.0) 0.5 else pairs / (p * n)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(2 * Bins)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HistAuc =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HistAuc =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): HistAuc =
    copy(label = newChildren(0), score = newChildren(1))
}
