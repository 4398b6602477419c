package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: the doc-boundary-preserving greedy
  * packing fold. Input is the token counts of one pack block's docs
  * in pack order (`array<long>`); output is each doc's start offset
  * in the PADDED token stream (`array<long>`, same length), under
  * the policy:
  *
  *   - a doc that fits in the open window's remainder is appended;
  *   - a doc that would cross the window boundary PADS the open
  *     window's tail and starts at the next boundary (no sub-window
  *     doc is ever split — the lever the pack-efficiency reports
  *     exist to justify);
  *   - a doc longer than one window starts at a boundary, spans
  *     ceil(n/budget) windows (recorded as split), and pads ITS OWN
  *     tail, so no following doc shares a window with a split tail.
  *
  * Equivalent group formulation (what the DuckDB oracle replays):
  * docs cut into maximal consecutive runs with run-sum ≤ budget
  * (an over-long doc forms a singleton run), each run padded to a
  * multiple of the budget.
  *
  * One O(n) primitive loop per block row, fully inside
  * WholeStageCodegen; blocks are bounded (≤ PackBlockDocs docs), so
  * the collected input array is bounded regardless of corpus size.
  * Null elements count as zero-token docs (they keep their offset
  * and advance nothing).
  */
case class GreedyPackOffsets(child: Expression, budget: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) if budget >= 1 =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"greedy pack needs array<bigint> counts and a positive budget, got " +
            s"${child.dataType.catalogString}, budget=$budget")
    }

  override def nullSafeEval(a: Any): Any = {
    val ns = a.asInstanceOf[ArrayData]
    val m = ns.numElements()
    val out = new Array[Long](m)
    val b = budget.toLong
    var poff = 0L
    var i = 0
    while (i < m) {
      val n = if (ns.isNullAt(i)) 0L else ns.getLong(i)
      val fill = poff % b
      if (fill != 0L && fill + n > b) poff += b - fill
      out(i) = poff
      poff += n
      if (n > b && poff % b != 0L) poff += b - poff % b
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val m = ctx.freshName("m"); val out = ctx.freshName("out")
      val b = ctx.freshName("b"); val poff = ctx.freshName("poff")
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val fill = ctx.freshName("fill")
      s"""
         |final int $m = $a.numElements();
         |final long[] $out = new long[$m];
         |final long $b = ${budget}L;
         |long $poff = 0L;
         |for (int $i = 0; $i < $m; $i++) {
         |  final long $n = $a.isNullAt($i) ? 0L : $a.getLong($i);
         |  final long $fill = $poff % $b;
         |  if ($fill != 0L && $fill + $n > $b) $poff += $b - $fill;
         |  $out[$i] = $poff;
         |  $poff += $n;
         |  if ($n > $b && $poff % $b != 0L) $poff += $b - $poff % $b;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): GreedyPackOffsets =
    copy(child = newChild)

  override def prettyName: String = "graft_greedy_pack"
}
