package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Row-local UNION scrub for the composed curation pipeline: given a
  * doc's tokens, the offsets of its duplicated `spanW`-token windows
  * (the ExactSubstr mask), and the ids of its boilerplate `segLen`-
  * aligned line segments (the CCNet line mask), produce
  *
  *   `struct(n_line_rm, n_span_rm, n_removed, kept)`
  *
  * — per-mask covered-position counts, the UNION coverage, and the
  * retained token array — in ONE pass. The kept tokens come back as
  * an `array<string>` (not a joined string) so the downstream
  * quality/lang-id profile ([[TokenProfile]]) runs directly on the
  * scrubbed stream with no re-split.
  *
  * This is the [[SpanScrub]] interval walk extended with a second,
  * grid-aligned mask: spans sort ascending and cover via the running
  * `maxEnd`; a position p is line-covered iff its segment `p/segLen`
  * is in the (sorted) boilerplate id list, advanced with the same
  * monotone pointer. Both masks are evaluated per position, so the
  * counts match the oracle's per-mask FILTER aggregates exactly and
  * the token stream never shuffles (the masks are join-bounded by
  * duplicated windows / boilerplate segments, not tokens). */
case class MultiScrub(first: Expression, second: Expression, third: Expression,
                      spanW: Int, segLen: Int)
    extends TernaryExpression {

  override def dataType: DataType = MultiScrub.OutType

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(_: StringType, _), ArrayType(IntegerType, _),
            ArrayType(IntegerType, _)) if spanW > 0 && segLen > 0 =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_multi_scrub needs (array<string>, array<int>, array<int>, " +
          s"spanW > 0, segLen > 0), got $other")
    }

  override def nullSafeEval(tokens: Any, starts: Any, segs: Any): Any =
    MultiScrub.compute(tokens.asInstanceOf[ArrayData], starts.asInstanceOf[ArrayData],
      segs.asInstanceOf[ArrayData], spanW, segLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = MultiScrub.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev,
      (a, b, c) => s"${ev.value} = $helper.compute($a, $b, $c, $spanW, $segLen);")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): MultiScrub =
    copy(first = newFirst, second = newSecond, third = newThird)

  override def prettyName: String = "graft_multi_scrub"
}

object MultiScrub {

  val OutType: StructType = StructType(Seq(
    StructField("n_line_rm", LongType, nullable = false),
    StructField("n_span_rm", LongType, nullable = false),
    StructField("n_removed", LongType, nullable = false),
    StructField("kept", ArrayType(StringType, containsNull = false), nullable = false)))

  private val Empty = UTF8String.fromString("")

  /** Static forwarder target for generated Java. */
  def compute(tokens: ArrayData, starts: ArrayData, segs: ArrayData,
              spanW: Int, segLen: Int): InternalRow = {
    val n = tokens.numElements()
    val m = starts.numElements()
    val s = new Array[Int](m)
    var i = 0
    while (i < m) { s(i) = starts.getInt(i); i += 1 }
    java.util.Arrays.sort(s)
    val q = segs.numElements()
    val g = new Array[Int](q)
    i = 0
    while (i < q) { g(i) = segs.getInt(i); i += 1 }
    java.util.Arrays.sort(g)
    val kept = new Array[UTF8String](n)
    var nKept = 0
    var nLine = 0L
    var nSpan = 0L
    var removed = 0L
    var sPtr = 0
    var gPtr = 0
    var maxEnd = -1
    var p = 0
    while (p < n) {
      while (sPtr < m && s(sPtr) <= p) {
        val e = s(sPtr) + spanW - 1
        if (e > maxEnd) maxEnd = e
        sPtr += 1
      }
      val spanCovered = maxEnd >= p
      val seg = p / segLen
      while (gPtr < q && g(gPtr) < seg) gPtr += 1
      val lineCovered = gPtr < q && g(gPtr) == seg
      if (lineCovered) nLine += 1L
      if (spanCovered) nSpan += 1L
      if (lineCovered || spanCovered) removed += 1L
      else {
        kept(nKept) = if (tokens.isNullAt(p)) Empty else tokens.getUTF8String(p)
        nKept += 1
      }
      p += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nLine, nSpan, removed,
        new GenericArrayData(java.util.Arrays.copyOf(kept, nKept)
          .asInstanceOf[Array[Any]])))
  }
}
