package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Row-local span scrub for the ExactSubstr dedup family: given a
  * doc's tokens and the (unsorted) offsets of its DUPLICATED
  * `width`-token windows, produce
  * `struct(n_removed, n_spans, kept)` — covered-position count,
  * MAXIMAL merged-span count, and the retained text — in ONE pass.
  *
  * This replaces a whole plan segment: the first cut exploded every
  * covered position, distinct-shuffled them, joined the full
  * (doc, pos, token) stream, ran a lag window for the
  * gaps-and-islands count, and collect_list-reassembled the kept
  * text — three shuffles OF THE TOKEN STREAM per report. With the
  * kernel, only the duplicated starts aggregate (bounded by the
  * corpus's duplicated windows, not its tokens) and the per-doc
  * report is a map stage — the token stream never shuffles.
  *
  * Interval walk: starts sort ascending, `maxEnd` tracks the
  * furthest covered position among starts ≤ p; p is covered iff
  * `maxEnd ≥ p`, a span opens when p is covered and p−1 was not —
  * bit-identical to the lag-window formulation the DuckDB oracle
  * still runs. */
case class SpanScrub(left: Expression, right: Expression, width: Int)
    extends BinaryExpression {

  override def dataType: DataType = SpanScrub.OutType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(_: StringType, _), ArrayType(IntegerType, _)) if width > 0 =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_span_scrub needs (array<string>, array<int>, width > 0), got $other")
  }

  override def nullSafeEval(tokens: Any, starts: Any): Any =
    SpanScrub.compute(tokens.asInstanceOf[ArrayData], starts.asInstanceOf[ArrayData], width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = SpanScrub.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $helper.compute($a, $b, $width);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): SpanScrub =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_span_scrub"
}

object SpanScrub {

  val OutType: StructType = StructType(Seq(
    StructField("n_removed", LongType, nullable = false),
    StructField("n_spans", LongType, nullable = false),
    StructField("kept", StringType, nullable = false)))

  private val Space = UTF8String.fromString(" ")
  private val Empty = UTF8String.fromString("")

  /** Static forwarder target for generated Java. */
  def compute(tokens: ArrayData, starts: ArrayData, width: Int): InternalRow = {
    val n = tokens.numElements()
    val m = starts.numElements()
    val s = new Array[Int](m)
    var i = 0
    while (i < m) { s(i) = starts.getInt(i); i += 1 }
    java.util.Arrays.sort(s)
    val kept = new Array[UTF8String](n)
    var nKept = 0
    var removed = 0L
    var spans = 0L
    var ptr = 0
    var maxEnd = -1
    var prevCovered = false
    var p = 0
    while (p < n) {
      while (ptr < m && s(ptr) <= p) {
        val e = s(ptr) + width - 1
        if (e > maxEnd) maxEnd = e
        ptr += 1
      }
      val covered = maxEnd >= p
      if (covered) {
        removed += 1L
        if (!prevCovered) spans += 1L
      } else {
        val t = if (tokens.isNullAt(p)) Empty else tokens.getUTF8String(p)
        kept(nKept) = t
        nKept += 1
      }
      prevCovered = covered
      p += 1
    }
    val keptStr = UTF8String.concatWs(Space, java.util.Arrays.copyOf(kept, nKept): _*)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](removed, spans, keptStr))
  }
}
