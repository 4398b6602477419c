package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native per-document token profile over a token `array<string>` —
  * ALL the counts the quality/lang-id pipeline needs in ONE pass:
  *
  *   [n_tokens, n_stop, n_distinct, s_en, s_de, s_fr, s_es]
  *
  * Bit-identical to the HOF formulation in
  * [[graft.queries.TextOps.scrubbedQuality]] (one `filter` lambda per
  * marker set plus an `array_distinct`, i.e. 6+ boxed interpreted
  * passes per row — higher-order functions are CodegenFallback).
  * The marker sets are the engine's published lang-id/quality
  * constants (SURVEY.md text ops): stopwords {the, a}; en {the, a,
  * of}; de {der, die, das}; fr {le, la, les}; es {el, los, las}.
  * The distinct count uses a per-row hash set over the token bytes.
  */
case class TokenProfile(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_token_profile needs array<string>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    TokenProfile.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = TokenProfile.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $helper.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenProfile =
    copy(child = newChild)

  override def prettyName: String = "graft_token_profile"
}

object TokenProfile {

  private val Stop = Array("the", "a").map(UTF8String.fromString)
  private val En = Array("the", "a", "of").map(UTF8String.fromString)
  private val De = Array("der", "die", "das").map(UTF8String.fromString)
  private val Fr = Array("le", "la", "les").map(UTF8String.fromString)
  private val Es = Array("el", "los", "las").map(UTF8String.fromString)

  private def inSet(t: UTF8String, set: Array[UTF8String]): Boolean = {
    var i = 0
    while (i < set.length) { if (set(i).equals(t)) return true; i += 1 }
    false
  }

  /** Shared interpreted/codegen kernel — static forwarder makes this
    * callable as `graft.functions.TokenProfile.compute(...)` from
    * generated Java. */
  def compute(tokens: ArrayData): ArrayData = {
    val n = tokens.numElements()
    var nStop = 0L; var sEn = 0L; var sDe = 0L; var sFr = 0L; var sEs = 0L
    val seen = new java.util.HashSet[UTF8String](Math.max(16, n * 2))
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val t = tokens.getUTF8String(i)
        if (inSet(t, Stop)) nStop += 1
        if (inSet(t, En)) sEn += 1
        if (inSet(t, De)) sDe += 1
        if (inSet(t, Fr)) sFr += 1
        if (inSet(t, Es)) sEs += 1
        seen.add(t)
      } else seen.add(null) // array_distinct counts a null element once
      i += 1
    }
    new GenericArrayData(Array[Long](n, nStop, seen.size, sEn, sDe, sFr, sEs))
  }
}
