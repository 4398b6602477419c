package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeSet, Descending, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Custom whole-operator: top-k rows per key — the semantics of
  * `row_number() OVER (PARTITION BY keys ORDER BY ord) <= k`, executed
  * without the window operator's full per-partition sort.
  *
  * Spark plans the window form as Exchange → Sort (all rows) →
  * WindowGroupLimit → Window → Filter. This operator replaces the
  * sort with per-key bounded heaps: Exchange (same shuffle on keys) →
  * single O(n log k) streaming pass holding only k rows per distinct
  * key in memory. At 100 TB with hot keys (billions of rows per key,
  * k in the tens) the sort's O(n log n) and its spill traffic are the
  * bottleneck this removes.
  *
  * Built as the full custom-operator stack (SURVEY.md §7.3 path c):
  * logical [[TopKPerKeyPlan]] → [[TopKPerKeyStrategy]] (installed via
  * `spark.experimental.extraStrategies`) → physical
  * [[TopKPerKeyExec]] declaring `ClusteredDistribution(keys)` so
  * Catalyst inserts exactly the one required shuffle.
  */
case class TopKPerKeyPlan(
    keys: Seq[Expression],
    sortOrder: Seq[SortOrder],
    k: Int,
    child: LogicalPlan,
    rankOutput: Option[Attribute] = None) extends UnaryNode {
  override def output: Seq[Attribute] = child.output ++ rankOutput
  override def producedAttributes: AttributeSet = AttributeSet(rankOutput.toSeq)
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyPlan =
    copy(child = newChild)
}

object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyPlan(keys, order, k, child, rankOut) =>
      TopKPerKeyExec(keys, order, k, planLater(child), rankOut) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(
    keys: Seq[Expression],
    sortOrder: Seq[SortOrder],
    k: Int,
    child: SparkPlan,
    rankOutput: Option[Attribute] = None) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output ++ rankOutput
  override def producedAttributes: AttributeSet = AttributeSet(rankOutput.toSeq)
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val keyExprs = keys
    val order = sortOrder
    val limit = k
    val emitRank = rankOutput.isDefined
    val outAttrs = output
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      // `ordering.lt(a, b)` ⇔ a ranks before b; PriorityQueue is a
      // max-heap, so its head is the currently-worst kept row.
      val ordering: Ordering[InternalRow] =
        org.apache.spark.sql.catalyst.expressions.RowOrdering.create(order, childOutput)
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      iter.foreach { row =>
        val key = keyProj(row)
        val heap = heaps.get(key) match {
          case Some(h) => h
          case None =>
            val h = mutable.PriorityQueue.empty[InternalRow](ordering)
            heaps.put(key.copy(), h)
            h
        }
        if (heap.size < limit) heap.enqueue(row.copy())
        else if (ordering.lt(row, heap.head)) { heap.dequeue(); heap.enqueue(row.copy()) }
      }
      if (!emitRank) heaps.valuesIterator.flatMap(h => h.toArray.sorted(ordering).iterator)
      else {
        // Append the 1-based within-key rank (`row_number()` value):
        // the heap's sorted drain makes it the index in emit order.
        val proj = UnsafeProjection.create(outAttrs, outAttrs)
        val rankRow = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
        val joined = new org.apache.spark.sql.catalyst.expressions.JoinedRow
        heaps.valuesIterator.flatMap { h =>
          var i = 0
          h.toArray.sorted(ordering).iterator.map { r =>
            i += 1
            rankRow.update(0, i)
            proj(joined(r, rankRow))
          }
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

object TopKPerKey {

  /** Top-k rows per key group. `orderBy` = (column, ascending). */
  def apply(df: DataFrame, keyCols: Seq[String],
            orderBy: Seq[(String, Boolean)], k: Int): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKPerKeyStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerKeyStrategy
    }
    val analyzed = df.queryExecution.analyzed
    def attr(name: String): Attribute =
      analyzed.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in ${analyzed.output.map(_.name).mkString(",")}"))
    val order = orderBy.map { case (n, asc) =>
      SortOrder(attr(n), if (asc) Ascending else Descending)
    }
    org.apache.spark.sql.graftbridge.Bridge.ofRows(spark,
      TopKPerKeyPlan(keyCols.map(attr), order, k, analyzed))
  }
}
